"""Pallas kernel numerics vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smalltts_tpu.ops import nn
from smalltts_tpu.ops.pallas.attention import fused_attention


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_attention_matches_sdpa(dtype):
    b, h, tq, s, d = 2, 4, 24, 56, 32
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, h, tq, d), dtype)
    k = jax.random.normal(kk, (b, h, s, d), dtype)
    v = jax.random.normal(kv, (b, h, s, d), dtype)
    mask = np.ones((b, s), bool)
    mask[0, 40:] = False
    mask[1, 10:20] = False
    mask = jnp.asarray(mask)

    ref = nn.sdpa(q, k, v, key_mask=mask)
    out = fused_attention(q, k, v, mask, interpret=True)
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol, rtol=tol
    )


def test_fused_attention_odd_head_dim():
    """DiT head_dim is 120 (not a lane multiple) — kernel must still be exact."""
    b, h, tq, s, d = 1, 2, 15, 37, 120
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, h, tq, d))
    k = jax.random.normal(kk, (b, h, s, d))
    v = jax.random.normal(kv, (b, h, s, d))
    mask = jnp.asarray(np.ones((b, s), bool).cumsum(1) <= 30)

    ref = nn.sdpa(q, k, v, key_mask=mask)
    out = fused_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


# ------------------------------------------------------------------ w8 kernels


from smalltts_tpu.ops.pallas.w8 import (  # noqa: E402
    quantize_w8,
    w8_matmul,
    w8_matmul_ref,
    w8_matmul_stacked,
)


@pytest.mark.parametrize("m,k,n", [(320, 960, 2880), (40, 2400, 960), (8, 960, 5760)])
def test_w8_matmul_matches_ref(m, k, n):
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (m, k), jnp.float32)
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.02
    w_q, scale = quantize_w8(w)
    ref = w8_matmul_ref(x, w_q, scale)
    out = w8_matmul(x, w_q, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_w8_quantization_error_bounded():
    """int8 per-channel weight rounding keeps the matmul within ~1% relative
    error of the fp32 product on gaussian data — the quality budget the
    opt-in quantized serving path relies on."""
    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (64, 960), jnp.float32)
    w = jax.random.normal(kw, (960, 960), jnp.float32) * 0.02
    exact = x @ w
    w_q, scale = quantize_w8(w)
    approx = w8_matmul_ref(x, w_q, scale)
    rel = np.linalg.norm(np.asarray(approx) - np.asarray(exact)) / np.linalg.norm(
        np.asarray(exact)
    )
    assert rel < 0.01, rel


def test_w8_matmul_stacked_picks_layer():
    l, m, k, n = 5, 32, 256, 384
    kx, kw = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(kx, (m, k), jnp.float32)
    w = jax.random.normal(kw, (l, k, n), jnp.float32) * 0.05
    w_q, scale = quantize_w8(w)
    for idx in (0, 2, 4):
        ref = w8_matmul_ref(x, w_q[idx], scale[idx])
        out = w8_matmul_stacked(x, w_q, scale, jnp.int32(idx), interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
        )


def test_w8_matmul_stacked_inside_scan():
    """The serving integration runs the stacked kernel inside lax.scan over
    the layer index — the scalar-prefetch index_map must trace correctly."""
    l, m, k, n = 4, 16, 128, 256
    kx, kw = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.normal(kx, (m, k), jnp.float32)
    w = jax.random.normal(kw, (l, k, n), jnp.float32) * 0.05
    w_q, scale = quantize_w8(w)

    def body(carry, idx):
        y = w8_matmul_stacked(carry[:, :k], w_q, scale, idx, interpret=True)
        return carry, y

    _, ys = jax.lax.scan(body, x, jnp.arange(l))
    for idx in range(l):
        ref = w8_matmul_ref(x, w_q[idx], scale[idx])
        np.testing.assert_allclose(
            np.asarray(ys[idx]), np.asarray(ref), atol=1e-4, rtol=1e-4
        )


def test_w8_matmul_all_layers_matches_ref():
    from smalltts_tpu.ops.pallas.w8 import (
        quantize_w8,
        w8_matmul_all_layers,
        w8_matmul_ref,
    )

    rng = np.random.RandomState(5)
    l, m, k, n = 3, 8, 32, 48
    x = jnp.asarray(rng.randn(m, k).astype(np.float32))
    w = rng.randn(l, k, n).astype(np.float32)
    w_q, scale = quantize_w8(jnp.asarray(w))
    out = w8_matmul_all_layers(x, w_q, scale, interpret=True)
    assert out.shape == (l, m, n)
    want = jax.vmap(lambda wq, sc: w8_matmul_ref(x, wq, sc))(w_q, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_w8_modulation_pipeline_parity():
    """SmallTTS(w8_modulation=True) must synthesize within quantization
    tolerance of the fp pipeline — same key, same inputs, only the adaLN
    modulation weights stored int8 (models/dit.quantize_modulations)."""
    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec
    from tiny import TINY_BACKBONE, TINY_CODEC

    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    # trained checkpoints have NONZERO modulation weights; the zero-init
    # (reference dit.py:281-285) would quantize exactly and hide the path
    lin = params["dit"]["blocks"]["attn_norm"]["linear"]
    lin["w"] = 0.3 * jax.random.normal(jax.random.PRNGKey(3),
                                       lin["w"].shape, lin["w"].dtype)
    lin["b"] = 0.1 * jax.random.normal(jax.random.PRNGKey(4),
                                       lin["b"].shape, lin["b"].dtype)
    # ...and the velocity head (also zero-init, model.py:53-54) — with it
    # zero the whole denoiser outputs zeros and any parity check is vacuous
    vel = params["velocity"]
    vel["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(5),
                                        vel["w"].shape, vel["w"].dtype)
    codec_params = init_codec(jax.random.PRNGKey(1), TINY_CODEC)
    mk = lambda w8: SmallTTS(  # noqa: E731
        params, codec_params, cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
        w8_modulation=w8)
    tts_fp, tts_w8 = mk(False), mk(True)

    lin = tts_w8.params["dit"]["blocks"]["attn_norm"]["linear"]
    assert "w_q" in lin and lin["w_q"].dtype == jnp.int8
    assert lin["scale"].dtype == jnp.float32  # survives the bf16 cast

    ref = np.random.RandomState(2).randn(8, 64).astype(np.float32)
    key = jax.random.PRNGKey(9)
    a_fp = tts_fp.synthesize(ref, [1, 2, 3, 4], 2.0, key=key)
    a_w8 = tts_w8.synthesize(ref, [1, 2, 3, 4], 2.0, key=key)
    assert a_fp.shape == a_w8.shape
    # int8 weight rounding is ~0.4% relative on the modulation weights;
    # downstream through 2 blocks + codec the waveform stays close
    err = np.abs(a_fp - a_w8).max()
    scale_ = max(np.abs(a_fp).max(), 1e-6)
    assert err / scale_ < 0.05, (err, scale_)
    # and the two are not trivially identical (the quantized path really ran)
    assert err > 0


def test_w8_stream_pipeline_parity():
    """SmallTTS(w8_stream=True) must synthesize within quantization
    tolerance of the fp pipeline — same key, same inputs, the denoise
    scan's weight streams (attn qkvg/to_out, ff w13/w2) stored int8 with
    per-layer per-output-channel scales (models/dit.quantize_stream_weights),
    dequantized by plain XLA convert+multiply (no Pallas)."""
    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec
    from tiny import TINY_BACKBONE, TINY_CODEC

    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    # nonzero adaLN modulations: with the zero-init (reference
    # dit.py:281-285) every block's tanh gates are 0, x never touches the
    # quantized qkv/ff weights, and parity is vacuously exact (the
    # w8_modulation test above hit the same trap)
    lin = params["dit"]["blocks"]["attn_norm"]["linear"]
    lin["w"] = 0.3 * jax.random.normal(jax.random.PRNGKey(3),
                                       lin["w"].shape, lin["w"].dtype)
    lin["b"] = 0.1 * jax.random.normal(jax.random.PRNGKey(4),
                                       lin["b"].shape, lin["b"].dtype)
    # nonzero velocity head (zero-init would make parity vacuous)
    vel = params["velocity"]
    vel["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(5),
                                        vel["w"].shape, vel["w"].dtype)
    codec_params = init_codec(jax.random.PRNGKey(1), TINY_CODEC)
    mk = lambda w8: SmallTTS(  # noqa: E731
        params, codec_params, cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
        w8_stream=w8)
    tts_fp, tts_w8 = mk(False), mk(True)

    attn = tts_w8.params["dit"]["blocks"]["attn"]
    assert "w_q" in attn["qkvg"] and attn["qkvg"]["w_q"].dtype == jnp.int8
    assert attn["qkvg"]["scale"].dtype == jnp.float32
    # scale is per-layer, per-output-channel: (L, 1, O)
    L, H, O = attn["qkvg"]["w_q"].shape
    assert attn["qkvg"]["scale"].shape == (L, 1, O)
    assert "w_q" in tts_w8.params["dit"]["blocks"]["ff"]["w2"]
    # cross-KV projections stay fp (cond-encode path, streamed once)
    assert "w" in attn["kv_ref"]

    ref = np.random.RandomState(2).randn(8, 64).astype(np.float32)
    key = jax.random.PRNGKey(9)
    a_fp = tts_fp.synthesize(ref, [1, 2, 3, 4], 2.0, key=key)
    a_w8 = tts_w8.synthesize(ref, [1, 2, 3, 4], 2.0, key=key)
    assert a_fp.shape == a_w8.shape
    err = np.abs(a_fp - a_w8).max()
    scale_ = max(np.abs(a_fp).max(), 1e-6)
    # 4 quantized matmuls per block compound; 10% bounds the random-init
    # worst case while still failing on any wiring bug (wrong scale axis
    # or layer slicing produces O(1) relative error)
    assert err / scale_ < 0.10, (err, scale_)
    assert err > 0  # the quantized path really ran


def test_quantize_stream_weights_dequant_exactness():
    """Round-trip check on the transform itself: dequantized int8 weights
    match fp within the per-channel bound 0.5 * scale (scale = max|w|/127
    per output channel per layer)."""
    from smalltts_tpu.models.dit import quantize_stream_weights
    from smalltts_tpu.models.backbone import init_backbone
    from tiny import TINY_BACKBONE

    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    fp = params["dit"]["blocks"]["ff"]["w2"]["w"]
    q = quantize_stream_weights(params)["dit"]["blocks"]["ff"]["w2"]
    deq = q["w_q"].astype(jnp.float32) * q["scale"]
    err = jnp.abs(deq - fp)
    bound = 0.5 * jnp.broadcast_to(q["scale"], fp.shape) + 1e-9
    assert bool(jnp.all(err <= bound)), float((err - bound).max())
