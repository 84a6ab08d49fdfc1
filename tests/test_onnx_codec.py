"""OnnxCodec integration: imported ONNX codec inside the TTS pipeline.

The real VibeVoice assets are absent in this environment (zero egress), so
these tests exercise the full path — .onnx files on disk -> OnnxCodec ->
SmallTTS fused synthesis graph — with a mini torch-exported codec of the
same I/O contract (reference: src/smalltts/codec/onnx.py:42-75). A
parity test against the actual assets is gated on their presence.
"""

import os

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from tests.test_onnxjax import export  # noqa: E402
from smalltts_tpu.onnxjax.codec import OnnxCodec, assets_present  # noqa: E402

HOP = 20  # mini codec hop (real VibeVoice: 3200)
LATENT = 64


class MiniVVEncoder(nn.Module):
    """(B,1,T) -> (B, T/20, 64)."""

    def __init__(self):
        super().__init__()
        self.stem = nn.Conv1d(1, 16, 7, padding=3)
        self.d1 = nn.Conv1d(16, 32, 8, stride=4, padding=2)
        self.d2 = nn.Conv1d(32, 64, 10, stride=5, padding=3)
        self.head = nn.Conv1d(64, LATENT, 1)

    def forward(self, x):
        h = F.gelu(self.stem(x))
        h = F.gelu(self.d1(h))
        h = F.gelu(self.d2(h))
        return self.head(h).transpose(1, 2)


class MiniVVDecoder(nn.Module):
    """(B, T', 64) -> (B, 1, T'*20)."""

    def __init__(self):
        super().__init__()
        self.inp = nn.Conv1d(LATENT, 32, 3, padding=1)
        self.u1 = nn.ConvTranspose1d(32, 16, 10, stride=5, padding=3, output_padding=1)
        self.u2 = nn.ConvTranspose1d(16, 8, 8, stride=4, padding=2)
        self.out = nn.Conv1d(8, 1, 7, padding=3)

    def forward(self, z):
        h = F.gelu(self.inp(z.transpose(1, 2)))
        h = F.gelu(self.u1(h))
        h = self.u2(h)
        return torch.tanh(self.out(h))


@pytest.fixture(scope="module")
def mini_assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("codec_assets")
    torch.manual_seed(3)
    enc, dec = MiniVVEncoder(), MiniVVDecoder()
    wav = torch.randn(1, 1, 8 * HOP) * 0.3
    (d / "encoder.onnx").write_bytes(
        export(enc, (wav,), dynamic_axes={"x": {0: "b", 2: "t"}})
    )
    with torch.no_grad():
        lat = enc(wav)
    (d / "decoder.onnx").write_bytes(
        export(dec, (lat,), dynamic_axes={"z": {0: "b", 1: "t"}})
    )
    return d, enc, dec


def test_onnx_codec_contract(mini_assets):
    d, enc_t, dec_t = mini_assets
    codec = OnnxCodec(str(d / "encoder.onnx"), str(d / "decoder.onnx"))
    assert set(codec.params) == {"encoder", "decoder"}
    audio = np.random.RandomState(0).randn(2, 1, 6 * HOP).astype(np.float32) * 0.3
    lat = np.asarray(jax.jit(codec.encode_fn)(codec.params, audio))
    assert lat.shape == (2, 6, LATENT)
    with torch.no_grad():
        want = enc_t(torch.from_numpy(audio)).numpy()
    np.testing.assert_allclose(lat, want, atol=3e-5, rtol=1e-4)
    wav = np.asarray(jax.jit(codec.decode_fn)(codec.params, lat))
    assert wav.shape == (2, 1, 6 * HOP)
    with torch.no_grad():
        want_wav = dec_t(torch.from_numpy(lat)).numpy()
    np.testing.assert_allclose(wav, want_wav, atol=5e-5, rtol=1e-3)


def test_onnx_codec_decoder_only(mini_assets):
    d, _, _ = mini_assets
    codec = OnnxCodec(None, str(d / "decoder.onnx"))
    lat = np.zeros((1, 4, LATENT), np.float32)
    out = codec.decode_fn(codec.params, lat)
    assert out.shape == (1, 1, 4 * HOP)
    with pytest.raises(ValueError, match="without an encoder"):
        codec.encode_fn(codec.params, np.zeros((1, 1, HOP), np.float32))


def test_pipeline_with_onnx_codec(mini_assets):
    """The fused synthesize graph runs with the imported decoder inline."""
    d, _, dec_t = mini_assets
    from smalltts_tpu.infer.pipeline import SmallTTS
    from tests.tiny import TINY_BACKBONE, TINY_CODEC

    codec = OnnxCodec(str(d / "encoder.onnx"), str(d / "decoder.onnx"))
    tts = SmallTTS(cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC, codec=codec, seed=0)
    assert tts.onnx_codec is codec

    b, r_bucket, p_bucket, t_bucket = 2, 32, 64, 16
    audio = tts.synthesize_padded(
        np.random.RandomState(1).randn(b, r_bucket, LATENT).astype(np.float32),
        np.full((b,), 8, np.int32),
        np.zeros((b, p_bucket), np.int32),
        np.full((b,), 5, np.int32),
        np.full((b,), 12, np.int32),
        t_bucket,
    )
    assert audio.shape == (b, 1, t_bucket * HOP)
    assert np.isfinite(audio).all()
    # encode_reference flows through the ONNX encoder. It pads to the
    # serving REF bucket at the SYSTEM hop (3200) and slices to the true
    # frame count — 3200 samples = 1 system frame. (The mini codec's hop-20
    # scale is a fixture artifact; the real VibeVoice hop IS 3200.)
    ref = tts.encode_reference(np.random.RandomState(2).randn(3200).astype(np.float32))
    assert ref.shape == (1, LATENT)


def test_codec_auto_falls_back_to_native(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # no assets/codec here
    assert not assets_present()
    from smalltts_tpu.infer.pipeline import SmallTTS
    from tests.tiny import TINY_BACKBONE, TINY_CODEC

    tts = SmallTTS(cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC, codec="auto", seed=0)
    assert tts.onnx_codec is None


def test_codec_rejects_unknown_backend():
    from smalltts_tpu.infer.pipeline import SmallTTS
    from tests.tiny import TINY_BACKBONE, TINY_CODEC

    with pytest.raises(ValueError, match="codec must be"):
        SmallTTS(cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC, codec="bogus")


def test_onnx_import_utils_no_onnx_package(mini_assets):
    """utils.onnx_import now runs on the in-repo parser (round 1 required
    the absent `onnx` package)."""
    d, _, _ = mini_assets
    from smalltts_tpu.utils.onnx_import import describe_graph, load_initializers

    inits = load_initializers(str(d / "encoder.onnx"))
    assert any(v.ndim == 3 for v in inits.values())  # conv weights
    desc = describe_graph(str(d / "encoder.onnx"))
    assert "Conv" in desc


@pytest.mark.skipif(
    not assets_present(), reason="reference VibeVoice ONNX assets not present"
)
def test_real_vibevoice_assets_import_and_roundtrip():
    """Asset-gated: with the published assets present, the import must
    succeed and the round trip must preserve shape contract + finiteness.
    (Waveform parity vs onnxruntime runs where ORT is installed.)"""
    codec = OnnxCodec()
    sr, hop = 24_000, 3_200
    audio = (
        0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)
    )[None, None, :]
    lat = np.asarray(jax.jit(codec.encode_fn)(codec.params, audio))
    assert lat.shape == (1, sr // hop, 64)
    recon = np.asarray(jax.jit(codec.decode_fn)(codec.params, lat))
    assert recon.shape[0] == 1 and recon.shape[1] == 1
    assert np.isfinite(recon).all()
    try:
        import onnxruntime as ort  # noqa: F401
    except ImportError:
        pytest.skip("onnxruntime absent: shape/finite checks only")
    sess = ort.InferenceSession("assets/codec/decoder.onnx")
    want = sess.run(None, {sess.get_inputs()[0].name: lat})[0]
    np.testing.assert_allclose(np.asarray(recon), want, atol=1e-3, rtol=1e-3)
