"""Pallas TPU kernel: the ENTIRE cached DiT denoise scan in one kernel.

VERDICT r4 #4. Every prior Pallas attempt here was a single-op kernel that
paid the `pallas_call` scheduling barrier per call and lost to XLA
(ops/pallas/attention.py:20-24, PERF.md w8 sections). The round-4/5
profile shows the denoise loop is neither MXU- nor HBM-saturated at
serving shapes — it is OP-GRANULARITY bound: ~100 small XLA ops per block
x 12 blocks x 4 steps, each too small to hide its neighbors' latency.

This kernel replaces the whole `lax.scan` over `_block_core`
(models/dit.py:371-384; reference src/smalltts/models/backbone/
dit.py:189-213) for the CACHED inference path: grid=(L,), the residual
stream lives in VMEM across all layers, and every weight matrix streams
HBM->VMEM through one explicitly double-buffered (2, 1024, 1024) window —
compute for chunk i overlaps the DMA of chunk i+1, across layer
boundaries; each layer's cross-KV cache prefetches under the previous
layer's FF.

Layout: heads are padded head_dim -> 128 lanes at LOAD time
(`pack_block_weights`, a serving-time transform like
fuse_serving_projections — zero pad lanes never contribute to any dot),
so every per-head lane slice in the kernel is 128-aligned. Per-head
RMS-norm runs via a head-mask matmul in the flat (*, heads*128) layout;
interleaved RoPE via full-lane cos/sin tables and a lane roll (pairs
never straddle head boundaries). Joint attention over [self | cross]
keys uses a two-piece softmax (shared max, shared denominator), so the
two key sources never need a lane-unaligned concat.

Numerics: bf16 storage, fp32 scores/softmax/norms (same policy as
ops.nn.sdpa); w2's output accumulates over 4 row chunks in the buffer
dtype, so bf16 outputs agree with the XLA scan to bf16 tolerance, not
bitwise (fp32 mode agrees ~1e-5; tests/test_pallas_block.py).

VMEM at the headline serving cell (B=8, T=40, S_c=192): ~14.3 MB — under
the ~16 MB/core budget. Cells that do not fit fall back to the XLA scan
(`fits_vmem` gate in models/dit.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WCH = 1024          # weight-window column chunk
CU = 512            # w13 a/b interleave unit
N_W2 = 4            # w2 row chunks
_DEBUG_STAGE = None  # test-only: "norm2" | "ffmid" | "w2" dumps into o_ref


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ------------------------------------------------------------------ packing


def pack_block_weights(blocks: dict, heads: int, head_dim: int) -> dict:
    """Stacked fused-serving block weights -> kernel layout (module doc).

    Expects fuse_serving_projections applied (qkvg / w13 present). Pure
    layout transform, applied once at load.
    """
    dp = _round_up(head_dim, 128)
    attn, ff = blocks["attn"], blocks["ff"]
    qkvg_w, qkvg_b = attn["qkvg"]["w"], attn["qkvg"]["b"]   # (L,H,4I),(L,4I)
    L, H, _ = qkvg_w.shape
    inner = heads * head_dim

    def pad_heads(w, n_src):
        # (..., n_src*inner) with per-head head_dim -> 128-aligned heads
        parts = jnp.split(w, n_src, axis=-1)
        out = []
        for p in parts:
            p = p.reshape(*p.shape[:-1], heads, head_dim)
            p = jnp.pad(p, [(0, 0)] * (p.ndim - 1) + [(0, dp - head_dim)])
            out.append(p.reshape(*p.shape[:-2], heads * dp))
        return jnp.concatenate(out, axis=-1)

    # [q|k|v|gate], ALL head-padded (the gate multiplies the per-head
    # attention output in the padded layout, so its lanes must track heads)
    qkvg_wp = pad_heads(qkvg_w, 4)
    qkvg_bp = pad_heads(qkvg_b, 4)

    # to_out: input side is the head-padded attention output; OUTPUT side is
    # lane-padded H -> Hp so the kernel's weight-window DMA destination is a
    # full-lane slice (Mosaic requires 128-aligned lane slicing on memrefs;
    # the zero pad lanes produce zero columns the kernel never reads)
    Hp = _round_up(H, 128)
    ow = attn["to_out"]["w"].reshape(L, heads, head_dim, H)
    ow = jnp.pad(ow, ((0, 0), (0, 0), (0, dp - head_dim), (0, 0)))
    ow = ow.reshape(L, heads * dp, H)
    ow = jnp.pad(ow, ((0, 0), (0, 0), (0, Hp - H)))

    # w13 interleaved in CU-column a/b pairs, F padded to a CU multiple
    w13_w, w13_b = ff["w13"]["w"], ff["w13"]["b"]            # (L,H,2F),(L,2F)
    F = w13_w.shape[-1] // 2
    fp = _round_up(F, max(CU, N_W2 * 16))
    w1 = jnp.pad(w13_w[..., :F], ((0, 0), (0, 0), (0, fp - F)))
    w3 = jnp.pad(w13_w[..., F:], ((0, 0), (0, 0), (0, fp - F)))
    b1 = jnp.pad(w13_b[..., :F], ((0, 0), (0, fp - F)))
    b3 = jnp.pad(w13_b[..., F:], ((0, 0), (0, fp - F)))
    nfc = fp // CU
    w13_wp = jnp.concatenate(
        [jnp.concatenate([w1[..., c * CU:(c + 1) * CU],
                          w3[..., c * CU:(c + 1) * CU]], axis=-1)
         for c in range(nfc)], axis=-1)                      # (L, H, 2*fp)
    w13_bp = jnp.concatenate(
        [jnp.concatenate([b1[..., c * CU:(c + 1) * CU],
                          b3[..., c * CU:(c + 1) * CU]], axis=-1)
         for c in range(nfc)], axis=-1)

    w2_wp = jnp.pad(ff["w2"]["w"],
                    ((0, 0), (0, fp - F), (0, Hp - H)))            # (L,fp,Hp)
    w2_bp = ff["w2"]["b"]                                           # (L, H)

    def pad_scale(s):  # (L, heads, d) -> (L, heads*dp), zero pad lanes
        s = jnp.pad(s, ((0, 0), (0, 0), (0, dp - head_dim)))
        return s.reshape(L, heads * dp)

    return {
        "qkvg_w": qkvg_wp, "qkvg_b": qkvg_bp,
        "out_w": ow,
        "w13_w": w13_wp, "w13_b": w13_bp,
        "w2_w": w2_wp, "w2_b": w2_bp,
        "q_scale": pad_scale(attn["q_norm"]["scale"]),
        "k_scale": pad_scale(attn["k_norm"]["scale"]),
    }


def pack_cross_kv(k_or_v: jax.Array, head_dim: int) -> jax.Array:
    """(L, B, heads, S, d) -> (L, B, S, heads*dp) head-padded flat layout."""
    dp = _round_up(head_dim, 128)
    L, B, h, S, d = k_or_v.shape
    x = jnp.pad(k_or_v, ((0, 0),) * 4 + ((0, dp - d),))
    return x.transpose(0, 1, 3, 2, 4).reshape(L, B, S, h * dp)


def rope_tables(rope_freqs: np.ndarray, heads: int, head_dim: int,
                seq: int) -> Tuple[np.ndarray, np.ndarray]:
    """(T, rot_dim) duplicated-freq table -> full-lane (T, heads*dp)
    cos/sin with cos=1, sin=0 outside each head's rotated lanes."""
    dp = _round_up(head_dim, 128)
    rot = rope_freqs.shape[-1]
    cos1 = np.ones((seq, dp), np.float32)
    sin1 = np.zeros((seq, dp), np.float32)
    cos1[:, :rot] = np.cos(rope_freqs[:seq])
    sin1[:, :rot] = np.sin(rope_freqs[:seq])
    return (np.tile(cos1, (1, heads)), np.tile(sin1, (1, heads)))


# scoped-VMEM limit requested from Mosaic (v5e physical VMEM is 128 MiB;
# the 16 MiB default is a compiler default, not the hardware — measured:
# the headline 8x40 cell needs 17.6 MiB and compiles+runs with this raised)
VMEM_LIMIT = 100 * 2 ** 20


def fits_vmem(B: int, T: int, S_c: int, heads: int, head_dim: int,
              hidden: int, ff_dim: int, dtype_bytes: int = 2,
              budget: int = VMEM_LIMIT - 6 * 2 ** 20) -> bool:
    """True when the kernel's VMEM footprint fits the requested limit.

    Counts scratch AND Pallas's (double-buffered) input/output blocks —
    the original scratch-only estimate under-counted by ~3.8 MiB at the
    headline cell (v5e compile log: 17.59M needed vs 14.3M estimated).
    The 6 MiB margin covers small blocked inputs, tile padding, and the
    compiler's own temporaries.
    """
    dp = _round_up(head_dim, 128)
    hp = heads * dp
    need = dtype_bytes * (
        2 * B * T * hidden      # x input block + out block
        + B * T * hidden        # out carry
        + B * T * hp            # normbuf
        + B * T * 4 * hp        # qkvg / ffmid buffer
        + 2 * B * S_c * hp      # cross K and V
        + 2 * 1024 * 1024       # weight window
        + 2 * 6 * B * hidden    # per-layer modulations (double-buffered)
    ) + 4 * (
        2 * T * hp              # rope tables (fp32)
        + 128 * hp + 8 * hp     # head masks (lane/sublane padded, fp32)
    )
    return need <= budget


# ------------------------------------------------------------------- kernel


def _ln(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


def _rope_rotate(x, cos, sin):
    """Full-lane interleaved RoPE; pairs never straddle head boundaries."""
    xf = x.astype(jnp.float32)
    lanes = xf.shape[-1]
    # pltpu.roll requires non-negative shifts: roll by lanes-1 == roll by -1
    xm = pltpu.roll(xf, lanes - 1, axis=xf.ndim - 1)  # x[i+1] to even i
    xp = pltpu.roll(xf, 1, axis=xf.ndim - 1)          # x[i-1] to odd i
    lane = jax.lax.broadcasted_iota(jnp.int32, xf.shape, xf.ndim - 1)
    swapped = jnp.where(lane % 2 == 0, -xm, xp)
    return (xf * cos + swapped * sin).astype(x.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "head_dim", "hidden", "ff_dim", "interpret"))
def fused_dit_scan(x, mods, self_bias, cross_bias, row_mask, rope_cos,
                   rope_sin, packed, k_cross, v_cross, *, heads, head_dim,
                   hidden, ff_dim, interpret=False):
    """Full L-layer cached DiT block scan in ONE pallas_call.

    x (B,T,H); mods (L,6,B,H) pre-split adaLN modulations; self_bias
    (B,1,T) / cross_bias (B,1,Sc) additive fp32 key biases (0 valid,
    -1e9 masked); row_mask (B,T,1) 1/0; rope_cos/sin (T, heads*dp) fp32;
    packed = pack_block_weights(...); k/v_cross = pack_cross_kv(...).
    """
    B, T, H = x.shape
    L = mods.shape[0]
    dp = _round_up(head_dim, 128)
    hp = heads * dp
    fp = packed["w2_w"].shape[1]
    Sc = k_cross.shape[2]
    dtype = x.dtype
    nq = (4 * hp) // WCH
    nf = (2 * fp) // WCH
    RCH = fp // N_W2
    kinds = ([("qkvg", c) for c in range(nq)] + [("out", 0)]
             + [("w13", c) for c in range(nf)]
             + [("w2", r) for r in range(N_W2)])
    n = len(kinds)
    scale = 1.0 / float(np.sqrt(head_dim))

    hm = np.zeros((hp, heads), np.float32)
    for h in range(heads):
        hm[h * dp:h * dp + head_dim, h] = 1.0

    def kernel(x_ref, mods_ref, selfb_ref, crossb_ref, rowm_ref,
               cos_ref, sin_ref, hm_ref, hmt_ref, qs_ref, ks_ref,
               qkvgb_ref, w13b_ref, w2b_ref,
               qkvg_hbm, out_hbm, w13_hbm, w2_hbm, kc_hbm, vc_hbm,
               o_ref,
               normbuf, qbuf, kbuf, vbuf, wbuf,
               cnt, sem_w, sem_kv):
        l = pl.program_id(0)

        def w_copy(kind, c, layer, slot):
            if kind == "qkvg":
                return pltpu.make_async_copy(
                    qkvg_hbm.at[layer, :, c * WCH:(c + 1) * WCH],
                    wbuf.at[slot, :H, :], sem_w.at[slot])
            if kind == "out":
                # out/w2 windows are lane-padded to Hp at pack time — full-
                # lane DMA destinations (Mosaic: lane slices must be 128-
                # aligned on memrefs)
                return pltpu.make_async_copy(
                    out_hbm.at[layer], wbuf.at[slot, :hp, :],
                    sem_w.at[slot])
            if kind == "w13":
                return pltpu.make_async_copy(
                    w13_hbm.at[layer, :, c * WCH:(c + 1) * WCH],
                    wbuf.at[slot, :H, :], sem_w.at[slot])
            return pltpu.make_async_copy(
                w2_hbm.at[layer, c * RCH:(c + 1) * RCH, :],
                wbuf.at[slot, :RCH, :], sem_w.at[slot])

        def kv_copies(layer):
            return (pltpu.make_async_copy(kc_hbm.at[layer], kbuf,
                                          sem_kv.at[0]),
                    pltpu.make_async_copy(vc_hbm.at[layer], vbuf,
                                          sem_kv.at[1]))

        @pl.when(l == 0)
        def _():
            o_ref[...] = x_ref[...]
            cnt[0] = 0
            w_copy(kinds[0][0], kinds[0][1], 0, 0).start()
            for dma in kv_copies(0):
                dma.start()

        def slot_of(i):
            return (cnt[0] + i) % 2

        mod = [mods_ref[0, i].astype(jnp.float32) for i in range(6)]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mod

        normbuf[:, :, :H] = (
            _ln(o_ref[...]) * (1.0 + scale_msa[:, None, :])
            + shift_msa[:, None, :]
        ).astype(dtype)

        for i, (kind, c) in enumerate(kinds):
            if i + 1 < n:
                w_copy(kinds[i + 1][0], kinds[i + 1][1], l,
                       slot_of(i + 1)).start()
            else:
                @pl.when(l + 1 < L)
                def _():
                    w_copy(kinds[0][0], kinds[0][1], l + 1,
                           slot_of(i + 1)).start()
            w_copy(kind, c, l, slot_of(i)).wait()
            slot = slot_of(i)

            if kind == "qkvg":
                acc = jax.lax.dot_general(
                    normbuf[:, :, :H], wbuf[slot, :H, :],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + qkvgb_ref[0, :, c * WCH:(c + 1) * WCH
                                      ].astype(jnp.float32)[:, None, :]
                qbuf[:, :, c * WCH:(c + 1) * WCH] = acc.astype(dtype)

                if c == nq - 1:
                    # -------- q/k norm + rope, then two-piece-softmax SDPA
                    def rms(seg, scale_ref):
                        sf = seg.astype(jnp.float32)
                        ssq = jax.lax.dot_general(
                            sf * sf, hm_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        inv = jax.lax.rsqrt(ssq / float(head_dim) + 1e-6)
                        invl = jax.lax.dot_general(
                            inv, hmt_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        sc = scale_ref[0].astype(jnp.float32)[:, None, :]
                        return (sf * invl * sc).astype(dtype)

                    cosb = cos_ref[...][None]
                    sinb = sin_ref[...][None]
                    qbuf[:, :, 0:hp] = _rope_rotate(
                        rms(qbuf[:, :, 0:hp], qs_ref), cosb, sinb)
                    qbuf[:, :, hp:2 * hp] = _rope_rotate(
                        rms(qbuf[:, :, hp:2 * hp], ks_ref), cosb, sinb)
                    for dma in kv_copies(l):
                        dma.wait()

                    def attend_b(b, carry):
                        for h in range(heads):
                            lo = h * dp
                            q_bh = qbuf[b, :, lo:lo + dp].astype(jnp.float32)
                            k_bh = qbuf[b, :, hp + lo:hp + lo + dp
                                        ].astype(jnp.float32)
                            v_bh = qbuf[b, :, 2 * hp + lo:2 * hp + lo + dp
                                        ].astype(jnp.float32)
                            kc_bh = kbuf[b, :, lo:lo + dp].astype(jnp.float32)
                            vc_bh = vbuf[b, :, lo:lo + dp].astype(jnp.float32)
                            s1 = jax.lax.dot_general(
                                q_bh, k_bh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
                            s2 = jax.lax.dot_general(
                                q_bh, kc_bh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
                            s1 = s1 + selfb_ref[b]
                            s2 = s2 + crossb_ref[b]
                            m = jnp.maximum(
                                jnp.max(s1, axis=-1, keepdims=True),
                                jnp.max(s2, axis=-1, keepdims=True))
                            e1 = jnp.exp(s1 - m)
                            e2 = jnp.exp(s2 - m)
                            den = (jnp.sum(e1, axis=-1, keepdims=True)
                                   + jnp.sum(e2, axis=-1, keepdims=True))
                            o = (jnp.dot(e1, v_bh,
                                         preferred_element_type=jnp.float32)
                                 + jnp.dot(e2, vc_bh,
                                           preferred_element_type=jnp.float32)
                                 ) / den
                            g = jax.nn.sigmoid(
                                qbuf[b, :, 3 * hp + lo:3 * hp + lo + dp
                                     ].astype(jnp.float32))
                            normbuf[b, :, lo:lo + dp] = (o * g).astype(dtype)
                        return carry

                    jax.lax.fori_loop(0, B, attend_b, 0)

                    # next layer's cross-KV prefetches under to_out + FF
                    @pl.when(l + 1 < L)
                    def _():
                        for dma in kv_copies(l + 1):
                            dma.start()

            elif kind == "out":
                attn_out = jax.lax.dot_general(
                    normbuf[:, :, :hp], wbuf[slot, :hp, :H],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                attn_out = attn_out * rowm_ref[...].astype(jnp.float32)
                o_ref[...] = (
                    o_ref[...].astype(jnp.float32)
                    + jnp.tanh(gate_msa)[:, None, :] * attn_out
                ).astype(dtype)
                normbuf[:, :, :H] = (
                    _ln(o_ref[...]) * (1.0 + scale_mlp[:, None, :])
                    + shift_mlp[:, None, :]
                ).astype(dtype)
                if _DEBUG_STAGE == "norm2":
                    o_ref[...] = normbuf[:, :, :H]

            elif kind == "w13":
                acc = jax.lax.dot_general(
                    normbuf[:, :, :H], wbuf[slot, :H, :],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + w13b_ref[0, :, c * WCH:(c + 1) * WCH
                                     ].astype(jnp.float32)[:, None, :]
                qbuf[:, :, c * CU:(c + 1) * CU] = (
                    jax.nn.silu(acc[:, :, :CU]) * acc[:, :, CU:]
                ).astype(dtype)
                if _DEBUG_STAGE == "ffmid":
                    o_ref[...] = qbuf[:, :, :H]

            else:  # w2 row chunk; partial accumulation in buffer dtype
                part = jax.lax.dot_general(
                    qbuf[:, :, c * RCH:(c + 1) * RCH], wbuf[slot, :RCH, :H],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype)
                if c == 0:
                    qbuf[:, :, 3 * hp:3 * hp + H] = part
                else:
                    qbuf[:, :, 3 * hp:3 * hp + H] = (
                        qbuf[:, :, 3 * hp:3 * hp + H] + part)
                if c == N_W2 - 1 and _DEBUG_STAGE is None:
                    # NB no row mask here: the XLA scan's _block_core only
                    # masks the ATTENTION branch output (models/dit.py _attend);
                    # FF values on padded rows flow unmasked in both paths
                    ff = (qbuf[:, :, 3 * hp:3 * hp + H].astype(jnp.float32)
                          + w2b_ref[0].astype(jnp.float32)[:, None, :])
                    o_ref[...] = (
                        o_ref[...].astype(jnp.float32)
                        + jnp.tanh(gate_mlp)[:, None, :] * ff
                    ).astype(dtype)

        cnt[0] = cnt[0] + n

    return pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((B, T, H), lambda l: (0, 0, 0)),            # x
            pl.BlockSpec((1, 6, B, H), lambda l: (l, 0, 0, 0)),      # mods
            pl.BlockSpec((B, 1, T), lambda l: (0, 0, 0)),            # self b
            pl.BlockSpec((B, 1, Sc), lambda l: (0, 0, 0)),           # cross b
            pl.BlockSpec((B, T, 1), lambda l: (0, 0, 0)),            # row m
            pl.BlockSpec((T, hp), lambda l: (0, 0)),                 # cos
            pl.BlockSpec((T, hp), lambda l: (0, 0)),                 # sin
            pl.BlockSpec((hp, heads), lambda l: (0, 0)),             # hm
            pl.BlockSpec((heads, hp), lambda l: (0, 0)),             # hmT
            # per-layer vectors carry a singleton middle dim so the block's
            # last-two dims are (1, k) over an array whose second-to-last
            # dim IS 1 — TPU lowering requires last-two block dims divisible
            # by (8, 128) or equal to the array's (interpret mode doesn't
            # enforce this; real-TPU A/B did)
            pl.BlockSpec((1, 1, hp), lambda l: (l, 0, 0)),           # q scale
            pl.BlockSpec((1, 1, hp), lambda l: (l, 0, 0)),           # k scale
            pl.BlockSpec((1, 1, 4 * hp), lambda l: (l, 0, 0)),       # qkvg b
            pl.BlockSpec((1, 1, 2 * fp), lambda l: (l, 0, 0)),       # w13 b
            pl.BlockSpec((1, 1, H), lambda l: (l, 0, 0)),            # w2 b
            pl.BlockSpec(memory_space=pl.ANY),                    # qkvg w
            pl.BlockSpec(memory_space=pl.ANY),                    # out w
            pl.BlockSpec(memory_space=pl.ANY),                    # w13 w
            pl.BlockSpec(memory_space=pl.ANY),                    # w2 w
            pl.BlockSpec(memory_space=pl.ANY),                    # k cross
            pl.BlockSpec(memory_space=pl.ANY),                    # v cross
        ],
        out_specs=pl.BlockSpec((B, T, H), lambda l: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, H), dtype),
        scratch_shapes=[
            pltpu.VMEM((B, T, hp), dtype),            # normbuf / attn out
            pltpu.VMEM((B, T, 4 * hp), dtype),        # qkvg / ffmid / w2 acc
            pltpu.VMEM((B, Sc, hp), dtype),           # cross K
            pltpu.VMEM((B, Sc, hp), dtype),           # cross V
            pltpu.VMEM((2, 1024, 1024), dtype),       # weight window
            pltpu.SMEM((1,), jnp.int32),              # chunk counter
            pltpu.SemaphoreType.DMA((2,)),            # weight slots
            pltpu.SemaphoreType.DMA((2,)),            # cross K/V
        ],
        # the default scoped-vmem limit is 16 MiB; the headline serving cell
        # needs ~17.6 MiB once Pallas's double-buffered input blocks are
        # counted (v5e-1 compile log). v5e physical VMEM is larger — raise
        # the scoped limit rather than shrink the weight window.
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(
        x, mods, self_bias, cross_bias, row_mask,
        rope_cos, rope_sin, jnp.asarray(hm), jnp.asarray(hm.T),
        packed["q_scale"][:, None, :], packed["k_scale"][:, None, :],
        packed["qkvg_b"][:, None, :], packed["w13_b"][:, None, :],
        packed["w2_b"][:, None, :],
        packed["qkvg_w"], packed["out_w"], packed["w13_w"], packed["w2_w"],
        k_cross, v_cross,
    )
