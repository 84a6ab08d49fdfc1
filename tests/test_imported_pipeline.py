"""ImportedSmallTTS: the reference's published ONNX graph split, fused on TPU.

Real assets are absent (zero egress), so mini torch modules with the EXACT
positional I/O contract of assets/dmd/{condition_encoder,denoiser}.onnx +
assets/codec/decoder.onnx (reference: src/smalltts/infer/onnx.py:88-126)
are exported and the fused jitted loop is compared step-for-step against a
host-side replication of the reference sampling recurrence with injected
noise."""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from tests.test_onnxjax import export  # noqa: E402
from smalltts_tpu.onnxjax.pipeline import ImportedSmallTTS, _rope_freqs  # noqa: E402
from smalltts_tpu.ops.schedule import get_alpha_sigma  # noqa: E402

L, H, DH, LAT, HOP = 2, 2, 8, 16, 4


class MiniCond(nn.Module):
    """(ref, ref_len, phonemes, phonemes_mask) ->
    (k_ref, v_ref, ref_mask, k_text, v_text) with rank-5 KV stacks."""

    def __init__(self):
        super().__init__()
        self.ref_proj = nn.Linear(LAT, L * H * DH * 2)
        self.emb = nn.Embedding(50, L * H * DH * 2)

    def forward(self, ref, ref_len, phonemes, phonemes_mask):
        b, t, _ = ref.shape
        kv = self.ref_proj(ref).reshape(b, t, 2, L, H, DH).permute(2, 3, 0, 4, 1, 5)
        k_ref, v_ref = kv[0], kv[1]                     # (L, B, H, T, DH)
        ref_mask = (
            torch.arange(t).unsqueeze(0) < ref_len.unsqueeze(1)
        )
        p = phonemes.shape[1]
        kvt = self.emb(phonemes).reshape(b, p, 2, L, H, DH).permute(2, 3, 0, 4, 1, 5)
        k_text = kvt[0] * phonemes_mask.float()[None, :, None, :, None]
        v_text = kvt[1]
        return k_ref, v_ref, ref_mask, k_text, v_text


class MiniDen(nn.Module):
    """Positional contract of denoiser.onnx; every input participates so the
    exporter cannot prune any of them."""

    def __init__(self):
        super().__init__()
        self.inp = nn.Linear(LAT, 32)
        self.rope_proj = nn.Linear(64, 32)
        self.kv_proj = nn.Linear(DH, 32)
        self.out = nn.Linear(32, LAT)

    def forward(self, x_t, mask, t, k_ref, v_ref, ref_mask, k_text, v_text,
                phonemes_mask, rope):
        h = self.inp(x_t) * mask.float().unsqueeze(-1) + t.reshape(1, 1, 1)
        h = h + self.rope_proj(rope)
        ref_summary = (
            (k_ref + v_ref) * ref_mask.float()[None, :, None, :, None]
        ).mean(dim=(0, 2, 3))                            # (B, DH)
        text_summary = (
            (k_text + v_text) * phonemes_mask.float()[None, :, None, :, None]
        ).mean(dim=(0, 2, 3))
        h = h + self.kv_proj(ref_summary + text_summary).unsqueeze(1)
        return torch.tanh(self.out(h))


class MiniDec(nn.Module):
    def __init__(self):
        super().__init__()
        # ConvTranspose keeps the time axis dynamic in the export (a reshape
        # would bake the export-example length, unlike the real conv decoder)
        self.up = nn.ConvTranspose1d(LAT, 1, HOP, stride=HOP)

    def forward(self, latents):
        return torch.tanh(self.up(latents.transpose(1, 2)))


@pytest.fixture(scope="module")
def mini_published(tmp_path_factory):
    d = tmp_path_factory.mktemp("dmd_assets")
    torch.manual_seed(9)
    cond, den, dec = MiniCond(), MiniDen(), MiniDec()
    ref = torch.randn(1, 6, LAT)
    ref_len = torch.tensor([5], dtype=torch.int64)
    ph = torch.randint(1, 50, (1, 7))
    ph_mask = torch.ones(1, 7, dtype=torch.bool)
    (d / "condition_encoder.onnx").write_bytes(
        export(cond, (ref, ref_len, ph, ph_mask))
    )
    with torch.no_grad():
        kv = cond(ref, ref_len, ph, ph_mask)
    s = 5
    den_args = (
        torch.randn(1, s, LAT), torch.ones(1, s, dtype=torch.bool),
        torch.tensor([0.5]), *kv[:2], kv[2], *kv[3:], ph_mask,
        torch.from_numpy(_rope_freqs(s)),
    )
    (d / "denoiser.onnx").write_bytes(export(den, den_args))
    (d / "decoder.onnx").write_bytes(export(dec, (torch.randn(1, s, LAT),)))
    return d, cond, den, dec


def test_imported_pipeline_matches_reference_recurrence(mini_published):
    d, cond_t, den_t, dec_t = mini_published
    tts = ImportedSmallTTS(
        str(d / "condition_encoder.onnx"),
        str(d / "denoiser.onnx"),
        str(d / "decoder.onnx"),
    )
    rng = np.random.RandomState(0)
    ref = rng.randn(6, LAT).astype(np.float32)
    tokens = [3, 7, 9, 11, 2, 4, 8]
    duration = 2.2  # seq_len = int(2.2 * 24000 / 3200) = 16
    seq_len = int(duration * 24_000 / 3_200)
    noises = rng.randn(4, 1, seq_len, LAT).astype(np.float32)

    audio = tts.synthesize(ref, tokens, duration, noises=noises)
    assert audio.shape == (1, seq_len * HOP)

    # host-side replication of infer/onnx.py:98-129 with the same torch nets
    with torch.no_grad():
        kv = cond_t(
            torch.from_numpy(ref[None]), torch.tensor([6], dtype=torch.int64),
            torch.tensor([tokens]), torch.ones(1, 7, dtype=torch.bool),
        )
        rope = torch.from_numpy(_rope_freqs(seq_len))
        mask = torch.ones(1, seq_len, dtype=torch.bool)
        x_pred = torch.zeros(1, seq_len, LAT)
        for i, t_val in enumerate(np.linspace(1, 0, 4, dtype=np.float32)):
            a, sg = get_alpha_sigma(float(t_val))
            a, sg = float(a), float(sg)
            x_t = a * x_pred + sg * torch.from_numpy(noises[i])
            vel = den_t(x_t, mask, torch.tensor([float(t_val)]), *kv[:2],
                        kv[2], *kv[3:], torch.ones(1, 7, dtype=torch.bool),
                        rope)
            x_pred = a * x_t - sg * vel
        want = dec_t(x_pred).numpy()[0]
    np.testing.assert_allclose(audio, want, atol=2e-5, rtol=1e-4)


def test_imported_pipeline_fresh_noise_runs(mini_published):
    d, *_ = mini_published
    tts = ImportedSmallTTS(
        str(d / "condition_encoder.onnx"),
        str(d / "denoiser.onnx"),
        str(d / "decoder.onnx"),
    )
    # mini cond-encoder bakes its export shapes (unlike the real one whose
    # reshape chain is dynamic): reuse the export T/P here
    ref = np.random.RandomState(1).randn(6, LAT).astype(np.float32)
    a = tts.synthesize(ref, [1, 2, 3, 4, 5, 6, 7], 1.0, key=jax.random.PRNGKey(1))
    b = tts.synthesize(ref, [1, 2, 3, 4, 5, 6, 7], 1.0, key=jax.random.PRNGKey(2))
    assert a.shape == b.shape == (1, 7 * HOP)
    assert np.isfinite(a).all()
    assert not np.allclose(a, b)  # fresh noise per call


def test_assets_present_detection(tmp_path):
    from smalltts_tpu.onnxjax.pipeline import assets_present

    assert not assets_present(str(tmp_path))
    (tmp_path / "dmd").mkdir()
    (tmp_path / "codec").mkdir()
    for p in ("dmd/condition_encoder.onnx", "dmd/denoiser.onnx", "codec/decoder.onnx"):
        (tmp_path / p).write_bytes(b"x")
    assert assets_present(str(tmp_path))
