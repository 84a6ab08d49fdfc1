"""Fused whole-scan DiT block kernel (ops/pallas/block.py) vs the XLA scan.

Parity target: the exact `lax.scan` over `_block_core` that
models/dit.dit_forward_cached runs (the kernel replaces it 1:1 on the
serving path). Interpret mode on CPU; fp32 buffers so the comparison is
tight (~1e-5) — the TPU bf16 path is covered by the integration test in
models/dit.py's gate plus the bench A/B.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smalltts_tpu.models import dit as D
from smalltts_tpu.models.dit import DiTConfig, _block_core, init_dit
from smalltts_tpu.ops.pallas.block import (
    fits_vmem,
    fused_dit_scan,
    pack_block_weights,
    pack_cross_kv,
    rope_tables,
)

CFG = DiTConfig(latent_dim=16, phoneme_dim=16, hidden_dim=64, n_blocks=3,
                heads=4, rot_dim=8, conv_groups=4)
B, T, R, P = 2, 16, 8, 12


def _inputs(dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    p = init_dit(ks[0], CFG)
    p = D.fuse_serving_projections({"dit": p})["dit"]
    # zero-init adaLN would gate every block to identity — randomize so the
    # test can't pass vacuously (memory: adaln-zero parity trap)
    blocks = dict(p["blocks"])
    h = CFG.hidden_dim
    blocks["attn_norm"] = {"linear": {
        "w": 0.3 * jax.random.normal(ks[1], (CFG.n_blocks, h, 6 * h)),
        "b": 0.1 * jax.random.normal(ks[2], (CFG.n_blocks, 6 * h)),
    }}
    p["blocks"] = blocks

    x = jax.random.normal(ks[3], (B, T, h), dtype)
    emb = jax.random.normal(ks[4], (B, h))
    mods = D._all_block_modulations(p["blocks"], emb)      # (L, B, 6H)
    hd, hh = CFG.head_dim, CFG.heads
    kv = tuple(
        jax.random.normal(k, (CFG.n_blocks, B, hh, s, hd)) * 0.5
        for k, s in zip(ks[5:9], (R, R, P, P))
    )
    mask = jnp.arange(T)[None, :] < jnp.array([T, T - 5])[:, None]
    ref_mask = jnp.arange(R)[None, :] < jnp.array([R, R - 3])[:, None]
    ph_mask = jnp.arange(P)[None, :] < jnp.array([P - 2, P])[:, None]
    return p, x, mods, kv, mask, ref_mask, ph_mask


def _xla_scan(p, x, mods, kv, mask, ref_mask, ph_mask):
    joint = jnp.concatenate([mask, ref_mask, ph_mask], axis=1)
    rope = D._rope_slice(CFG, T)
    out = x
    for l in range(CFG.n_blocks):
        blk = jax.tree.map(lambda a: a[l], p["blocks"])
        out = _block_core(blk, CFG, out, mods[l], mask, joint, rope,
                          tuple(c[l] for c in kv))
    return out


def _kernel(p, x, mods, kv, mask, ref_mask, ph_mask):
    packed = pack_block_weights(p["blocks"], CFG.heads, CFG.head_dim)
    k_cross = pack_cross_kv(jnp.concatenate([kv[0], kv[2]], axis=3),
                            CFG.head_dim)
    v_cross = pack_cross_kv(jnp.concatenate([kv[1], kv[3]], axis=3),
                            CFG.head_dim)
    cos, sin = rope_tables(
        np.asarray(D._rope_slice(CFG, T)), CFG.heads, CFG.head_dim, T)
    mods6 = jnp.stack(jnp.split(mods, 6, axis=-1), axis=1)  # (L,6,B,H)
    cross_mask = jnp.concatenate([ref_mask, ph_mask], axis=1)
    self_bias = jnp.where(mask, 0.0, -1e9)[:, None, :].astype(jnp.float32)
    cross_bias = jnp.where(cross_mask, 0.0,
                           -1e9)[:, None, :].astype(jnp.float32)
    row_mask = mask[..., None].astype(jnp.float32)
    return fused_dit_scan(
        x, mods6, self_bias, cross_bias, row_mask,
        jnp.asarray(cos), jnp.asarray(sin), packed, k_cross, v_cross,
        heads=CFG.heads, head_dim=CFG.head_dim, hidden=CFG.hidden_dim,
        ff_dim=CFG.ff_dim, interpret=True)


def test_fused_scan_matches_xla_scan():
    p, x, mods, kv, mask, ref_mask, ph_mask = _inputs()
    want = _xla_scan(p, x, mods, kv, mask, ref_mask, ph_mask)
    got = _kernel(p, x, mods, kv, mask, ref_mask, ph_mask)
    assert got.shape == want.shape
    err = float(jnp.abs(got - want).max())
    denom = float(jnp.abs(want).max())
    assert err / denom < 2e-5, f"rel err {err / denom:.2e} (abs {err:.2e})"


def test_fused_scan_masks_matter():
    """Changing a masked key's content must not change the output, and
    changing the mask must."""
    p, x, mods, kv, mask, ref_mask, ph_mask = _inputs()
    base = _kernel(p, x, mods, kv, mask, ref_mask, ph_mask)
    # poison masked ref positions of batch 1 (ref_mask[1, R-3:] is False)
    kv2 = list(kv)
    kv2[0] = kv[0].at[:, 1, :, -1, :].set(1e3)
    kv2[1] = kv[1].at[:, 1, :, -1, :].set(1e3)
    got = _kernel(p, x, mods, tuple(kv2), mask, ref_mask, ph_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
    tighter = jnp.arange(T)[None, :] < jnp.array([T - 8, T - 8])[:, None]
    moved = _kernel(p, x, mods, kv, tighter, ref_mask, ph_mask)
    assert float(jnp.abs(moved - base).max()) > 1e-3


def test_fits_vmem_gate():
    # with the raised scoped-VMEM limit (v5e physical VMEM >> the 16 MiB
    # compiler default; ops/pallas/block.py VMEM_LIMIT) every b<=8 serving
    # bucket rides the kernel, including 10s b8; the adaptive-ceiling b32
    # at the 10s bucket and b64 do not fit
    assert fits_vmem(8, 40, 192, 8, 120, 960, 2400)
    assert fits_vmem(8, 240, 448, 8, 120, 960, 2400)
    assert fits_vmem(32, 40, 192, 8, 120, 960, 2400)
    assert not fits_vmem(32, 240, 448, 8, 120, 960, 2400)
    assert not fits_vmem(64, 120, 192, 8, 120, 960, 2400)


def test_smalltts_fused_block_integration():
    """SmallTTS(fused_block=True) routes the cached denoise scan through
    the kernel (interpret mode on CPU) and matches the XLA pipeline."""
    import sys

    sys.path.insert(0, "tests")
    from tiny import TINY_BACKBONE, TINY_CODEC

    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec

    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    codec = init_codec(jax.random.PRNGKey(1), TINY_CODEC)
    kw = dict(cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC, codec="native")
    base = SmallTTS(params, codec, **kw)
    fused = SmallTTS(params, codec, fused_block=True, **kw)
    assert "pallas" in fused.params["dit"]["blocks"]

    ref = jnp.asarray(np.random.RandomState(0).randn(6, 64), jnp.float32)
    ids = [3, 5, 7, 9]
    a = np.asarray(base.synthesize(ref, ids, 1.0))
    b = np.asarray(fused.synthesize(ref, ids, 1.0))
    assert a.shape == b.shape
    rel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
    assert rel < 5e-4, f"fused-block pipeline diverged: rel {rel:.2e}"
