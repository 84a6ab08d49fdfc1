"""In-graph int16 PCM output (SmallTTS(pcm16_out=True)).

The lever PERF.md's host-path profile named: quantize to int16 inside the
fused synthesis graph so the device->host result transfer halves (fp32 ->
int16) and encode_wav's host-side quantization disappears. The contract is
that the emitted WAV bytes match the fp32 path's to <=1 LSB — the graph
applies exactly serving/audio_io.pcm16's clamp/scale/rint convention.
(Same clamp/scale as the reference WAV writer, src/server/src/audio.rs:22-36,
but the rounding differs: we rint (round-half-even) where the reference
truncates toward zero ('as i16') — a pre-existing <=1 LSB divergence.)
"""

import asyncio

import numpy as np
import pytest

from smalltts_tpu.serving.audio_io import decode_wav, encode_wav, pcm16


def _tiny_pipelines(pcm16_out):
    import jax

    from tiny import TINY_BACKBONE, TINY_CODEC
    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec

    return SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC, pcm16_out=pcm16_out,
    )


def test_pcm16_graph_matches_host_quantization():
    """int16 from the graph == pcm16(fp32 from the graph), to <=1 LSB.

    (<=1 LSB, not bit-exact: appending the quantization ops can change XLA's
    fusion of the decode tail, which may perturb the fp32 audio by an ulp —
    a value sitting exactly on a rounding boundary then flips one LSB.)"""
    import jax

    f32 = _tiny_pipelines(False)
    i16 = _tiny_pipelines(True)
    key = jax.random.PRNGKey(7)

    ref = np.random.RandomState(0).randn(1, 32, f32.cfg.latent_dim).astype(np.float32)
    args = (ref, np.array([32]), np.array([[1, 2, 3, 4]]), np.array([4]),
            np.array([24]), 32)
    a_f32 = f32.synthesize_padded(*args, key=key)
    a_i16 = i16.synthesize_padded(*args, key=key)

    assert a_f32.dtype == np.float32
    assert a_i16.dtype == np.int16
    assert a_f32.shape == a_i16.shape

    host = np.frombuffer(pcm16(a_f32.reshape(-1)), dtype="<i2")
    diff = np.abs(a_i16.reshape(-1).astype(np.int32) - host.astype(np.int32))
    assert diff.max() <= 1
    # and overwhelmingly bit-identical, not just close
    assert (diff == 0).mean() > 0.999


def test_pcm16_passthrough_preserves_int16():
    """audio_io.pcm16 on int16 input is a byte-for-byte passthrough — the
    old float path would have clamped 32767-scaled ints to [-1, 1]."""
    x = np.array([-32767, -1, 0, 1, 32767, 12345], np.int16)
    assert pcm16(x) == x.astype("<i2").tobytes()
    # encode_wav carries it through unchanged
    wav = encode_wav(x, 24_000)
    decoded, sr = decode_wav(wav)
    assert sr == 24_000
    # decode_wav's PCM convention divides by 32768
    np.testing.assert_allclose(decoded.reshape(-1),
                               x.astype(np.float32) / 32768.0, atol=1e-7)


def test_as_float_rescales_int16_losslessly():
    from smalltts_tpu.infer.long_form import _as_float

    ints = np.arange(-32767, 32768, 97, dtype=np.int16)[None]
    f = _as_float(ints)
    assert f.dtype == np.float32 and f.min() >= -1.0 and f.max() <= 1.0
    # round trip through the ONE quantization convention recovers every int
    back = np.frombuffer(pcm16(f), dtype="<i2")
    np.testing.assert_array_equal(back, ints.reshape(-1))
    # float input passes through (flattened) untouched
    flt = np.linspace(-1, 1, 7, dtype=np.float32)[None]
    np.testing.assert_array_equal(_as_float(flt), flt.reshape(-1))


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def _synth_body():
    from test_serving import make_sine_wav

    boundary = "XB"
    wav = make_sine_wav(0.6)
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"\r\n\r\n'
    ).encode() + wav + (
        f"\r\n--{boundary}\r\n"
        'Content-Disposition: form-data; name="text"\r\n\r\n'
        "hi\r\n"
        f"--{boundary}--\r\n"
    ).encode()
    return boundary, body


@pytest.mark.parametrize("endpoint", ["/synthesize"])
def test_server_pcm16_serves_same_wav(endpoint):
    """A --pcm16 server returns the same audio as the fp32 server (<=1 LSB):
    the flag changes where quantization happens, never what the client
    hears. Both pipelines share seed, so the first request consumes the
    same PRNG subkey."""
    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config

    outs = []
    for pcm16_out in (False, True):
        tts = _tiny_pipelines(pcm16_out)
        server = TTSServer(tts=tts, x402_cfg=X402Config(mode="disabled"),
                           tokenizer=lambda text: [1, 2, 3, 4])
        boundary, body = _synth_body()
        status, headers, out = _run(server.handle(
            "POST", endpoint, {"duration": "1.0"},
            {"content-type": f"multipart/form-data; boundary={boundary}"},
            body,
        ))
        assert status == 200, out
        samples, sr = decode_wav(out)
        assert sr == 24_000
        outs.append(samples)
        _run(server.shutdown())
    a, b = outs
    assert a.shape == b.shape
    assert np.abs(a - b).max() <= (1.0 / 32767.0) + 1e-7


def test_stream_pcm16_crossfade_matches_float_path():
    """stream_synthesize_long fed int16 chunks blends amplitudes (via
    _as_float), not raw integer codes — concatenated output equals the
    float path's to one LSB."""
    from smalltts_tpu.infer.long_form import (
        crossfade_concat,
        stream_synthesize_long,
    )

    from smalltts_tpu.infer.long_form import split_sentences

    text = "One. Two. Three."
    n_chunks = len([c for c in split_sentences(text, 4) if c.strip()])
    assert n_chunks >= 2  # the crossfade path must actually blend
    rng = np.random.RandomState(3)
    parts = [rng.uniform(-0.9, 0.9, (1, 1200)).astype(np.float32)
             for _ in range(n_chunks)]
    quantized = [
        np.frombuffer(pcm16(p.reshape(-1)), "<i2").reshape(1, -1)
        for p in parts
    ]
    it_parts = iter(quantized)
    emits = list(stream_synthesize_long(
        None, None, text, synth=lambda chunk: next(it_parts),
        max_chars=4,  # per-sentence chunks (330 would pack all into one)
    ))
    got = np.concatenate(emits)
    want = crossfade_concat(
        [q.astype(np.float32) / 32767.0 for q in quantized]
    ).reshape(-1)
    np.testing.assert_allclose(got, want, atol=1.0 / 32767.0 + 1e-7)
