"""End-to-end inference pipeline tests on tiny configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiny import TINY_BACKBONE, TINY_CODEC
from smalltts_tpu.data.bucketing import (
    HOP_SIZE,
    LATENT_BUCKETS,
    frames_for_duration,
    pick_bucket,
)
from smalltts_tpu.infer.pipeline import SmallTTS, estimate_duration
from smalltts_tpu.models.backbone import init_backbone
from smalltts_tpu.models.codec import init_codec


def test_estimate_duration():
    assert estimate_duration("") == 0.5
    assert estimate_duration("a" * 23) == pytest.approx(2.0)
    assert estimate_duration("a" * 10_000) == 30.0


def test_frames_ceil_semantics():
    # server-side ceil (pipeline.rs:66), NOT python int() truncation
    assert frames_for_duration(2.0) == 15
    assert frames_for_duration(2.01) == 16
    assert frames_for_duration(0.0) == 1


def test_bucket_selection():
    assert pick_bucket(15, LATENT_BUCKETS) == 16
    assert pick_bucket(16, LATENT_BUCKETS) == 16
    assert pick_bucket(17, LATENT_BUCKETS) == 40
    assert pick_bucket(999, LATENT_BUCKETS) == 240


@pytest.fixture(scope="module")
def tts():
    return SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE,
        codec_cfg=TINY_CODEC,
    )


def test_synthesize_shapes(tts):
    ref = np.random.RandomState(0).randn(10, 64).astype(np.float32)
    ids = [5, 8, 13, 21]
    audio = tts.synthesize(ref, ids, duration_sec=2.0)
    assert audio.shape == (1, 15 * HOP_SIZE)
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0  # tanh output head


def test_synthesize_deterministic_given_key(tts):
    ref = np.random.RandomState(1).randn(8, 64).astype(np.float32)
    key = jax.random.PRNGKey(42)
    a1 = tts.synthesize(ref, [1, 2, 3], 1.0, key=key)
    a2 = tts.synthesize(ref, [1, 2, 3], 1.0, key=key)
    np.testing.assert_array_equal(a1, a2)


def test_encode_reference_roundtrip_shapes(tts):
    audio = np.random.RandomState(2).randn(3200 * 3 + 100).astype(np.float32) * 0.1
    lat = tts.encode_reference(audio)
    assert lat.shape == (4, 64)  # padded up to hop multiple


def test_synthesize_timed_stages(tts):
    ref_audio = np.random.RandomState(3).randn(3200 * 2).astype(np.float32) * 0.1
    audio, timing = tts.synthesize_timed(ref_audio, [4, 5, 6], 1.0)
    assert audio.shape == (1, 8 * HOP_SIZE)
    assert timing.total_ms > 0
    for stage in ("codec_enc_ms", "cond_enc_ms", "denoise_ms", "codec_dec_ms"):
        assert getattr(timing, stage) > 0


def test_multidevice_inference_matches_single(tts):
    """Same synthesis on a dp=8 mesh must produce identical audio."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from smalltts_tpu.parallel.mesh import make_mesh
    from tiny import TINY_BACKBONE, TINY_CODEC
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec

    mesh = make_mesh(dp=8, tp=1)
    tts_mesh = SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC, mesh=mesh,
    )
    ref = np.random.RandomState(5).randn(8, 8, 64).astype(np.float32)
    key = jax.random.PRNGKey(3)
    args = (
        ref, np.full(8, 8), np.tile(np.arange(1, 65)[None], (8, 1)),
        np.full(8, 10), np.full(8, 12), 16,
    )
    a_single = tts.synthesize_padded(*args, key=key)
    a_mesh = tts_mesh.synthesize_padded(*args, key=key)
    np.testing.assert_allclose(a_mesh, a_single, atol=2e-5)


def test_teacher_sampler_shapes(tts):
    from smalltts_tpu.infer.teacher_sampler import make_teacher_sampler
    from tiny import TINY_BACKBONE

    sampler = make_teacher_sampler(TINY_BACKBONE, num_steps=3)
    lat = sampler(
        tts.params,
        jnp.asarray(np.random.RandomState(0).randn(2, 8, 64), np.float32),
        jnp.asarray([8, 5]),
        jnp.asarray(np.random.RandomState(1).randint(1, 198, (2, 6))),
        jnp.asarray([6, 3]),
        jnp.asarray([16, 10]),
        jax.random.PRNGKey(0),
        t_bucket=16,
    )
    assert lat.shape == (2, 16, 64)
    assert np.isfinite(np.asarray(lat)).all()
    assert float(jnp.abs(lat[1, 10:]).max()) == 0.0


def test_forward_transcription_prepend(tts, monkeypatch):
    # forward() must prepend transcription tokens to text tokens
    import smalltts_tpu.text as text_mod

    calls = []
    orig = tts.synthesize

    def spy(ref, ids, dur, key=None):
        calls.append(list(ids))
        return orig(ref, ids, dur, key)

    monkeypatch.setattr(tts, "synthesize", spy)
    ref = np.random.RandomState(4).randn(8, 64).astype(np.float32)
    out = tts.forward([ref], [[1, 2]], [[3, 4]], duration_sec=1.0)
    assert len(out) == 1
    assert calls[0] == [1, 2, 3, 4]
