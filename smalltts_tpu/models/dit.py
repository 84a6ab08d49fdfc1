"""DiT backbone: 12 joint-attention blocks, hidden 960, adaLN-zero.

Capability parity with the reference DiT
(reference: src/smalltts/models/backbone/dit.py:256-367):

* joint attention — q/k_self/v_self from x (RoPE on first 64 of 120 head
  dims), per-block cross K/V projections for the style sequence and the
  phoneme memory, keys concatenated [self | ref | text] into ONE attention
  (dit.py:112-129), sigmoid gate on the attention output;
* adaLN-zero modulation with zero-init (dit.py:281-285) and tanh gates
  (dit.py:198-201); SwiGLU FF with ratio 2.5 (dit.py:195);
* grouped Conv1d(k=31, groups=16) + Mish positional stem (dit.py:215-236);
* cached-inference API: `encode_cross_kv` precomputes per-block ref/text K/V
  once, `forward_cached` reuses them per denoise step (dit.py:300-327).

TPU-first re-design (NOT a translation):

* the 12 blocks are a *stacked pytree* scanned with `lax.scan` — one compiled
  block body instead of 12 unrolled copies (12x smaller HLO, much faster
  compiles), and the per-layer features the discriminator needs fall out of
  the scan's stacked outputs for free;
* cross-KV caches are stacked arrays (L, B, H, T, D) threaded as scan inputs —
  no Python list-of-dicts crossing the host boundary like the reference's
  rank-5 ONNX feeds (src/server/src/pipeline.rs:135-142);
* RoPE tables are static constants baked into the jitted graph, never fed
  from host (vs src/smalltts/infer/onnx.py:42-47,98);
* optional rematerialization via `jax.checkpoint` on the scanned block.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from smalltts_tpu.ops import nn
from smalltts_tpu.ops.rope import apply_rope_interleaved, rope_table_interleaved


@dataclass(frozen=True)
class DiTConfig:
    latent_dim: int = 64
    phoneme_dim: int = 512
    hidden_dim: int = 960
    n_blocks: int = 12
    heads: int = 8
    mlp_ratio: float = 2.5
    rot_dim: int = 64
    conv_kernel: int = 31
    conv_groups: int = 16
    max_seq: int = 4096
    remat: bool = False  # rematerialize each block in the backward pass
    # lax.scan unroll factor for the 12-block loop (inference paths): >1
    # trades HLO size for less per-iteration loop overhead; measured on
    # v5e-1 before changing the default (see PERF.md)
    scan_unroll: int = 1

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.heads

    @property
    def ff_dim(self) -> int:
        return int(self.hidden_dim * self.mlp_ratio)


class CrossKV(NamedTuple):
    """Precomputed per-layer cross-attention K/V, each (L, B, H, T, D)."""

    k_ref: jax.Array
    v_ref: jax.Array
    k_text: jax.Array
    v_text: jax.Array


# ---------------------------------------------------------------------- init


def _init_block(key, cfg: DiTConfig, dtype):
    ks = jax.random.split(key, 16)
    h, hd, inner = cfg.heads, cfg.head_dim, cfg.hidden_dim
    return {
        "attn_norm": {  # adaLN-zero modulation, zero-init (dit.py:281-283)
            "linear": nn.init_zeros_linear(inner, inner * 6, dtype=dtype),
        },
        "attn": {
            # q/k_self/v_self fused into ONE (inner, 3*inner) matmul and each
            # cross K/V pair into (inner, 2*inner) — fewer, wider MXU calls
            # than the reference's 9 separate projections (dit.py:63-77);
            # the torch converter concatenates the reference weights to match.
            "qkv_self": nn.init_linear(ks[0], inner, inner * 3, dtype=dtype),
            "gate": nn.init_linear(ks[3], inner, inner, bias=False, dtype=dtype),
            "to_out": nn.init_linear(ks[4], inner, inner, bias=False, dtype=dtype),
            "q_norm": nn.init_rmsnorm((h, hd), dtype),
            "k_norm": nn.init_rmsnorm((h, hd), dtype),
            "kv_ref": nn.init_linear(ks[5], inner, inner * 2, dtype=dtype),
            "kv_text": nn.init_linear(ks[7], inner, inner * 2, dtype=dtype),
            "k_norm_cross": nn.init_rmsnorm((h, hd), dtype),
        },
        "ff": {
            "w1": nn.init_linear(ks[9], inner, cfg.ff_dim, dtype=dtype),
            "w3": nn.init_linear(ks[10], inner, cfg.ff_dim, dtype=dtype),
            "w2": nn.init_linear(ks[11], cfg.ff_dim, inner, dtype=dtype),
        },
    }


def init_dit(key, cfg: DiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.n_blocks + 8)
    blocks = [_init_block(ks[i], cfg, dtype) for i in range(cfg.n_blocks)]
    # stack the per-block pytrees into leading-dim-L leaves for lax.scan
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
    kk = ks[cfg.n_blocks :]
    return {
        "input_embed": {
            "proj": nn.init_linear(kk[0], cfg.latent_dim, cfg.hidden_dim, dtype=dtype),
            "conv1": nn.init_conv1d(
                kk[1], cfg.hidden_dim, cfg.hidden_dim, cfg.conv_kernel, cfg.conv_groups, dtype
            ),
            "conv2": nn.init_conv1d(
                kk[2], cfg.hidden_dim, cfg.hidden_dim, cfg.conv_kernel, cfg.conv_groups, dtype
            ),
        },
        "phoneme_proj": nn.init_linear(kk[3], cfg.phoneme_dim, cfg.hidden_dim, dtype=dtype),
        "emb_proj": {
            "l1": nn.init_linear(kk[4], cfg.hidden_dim, cfg.hidden_dim * 2, dtype=dtype),
            "l2": nn.init_linear(kk[5], cfg.hidden_dim * 2, cfg.hidden_dim, dtype=dtype),
        },
        "blocks": stacked,
        "norm_out": {"linear": nn.init_zeros_linear(cfg.hidden_dim, cfg.hidden_dim * 2, dtype=dtype)},
    }


# --------------------------------------------------------------------- pieces


def _input_embed(p, cfg: DiTConfig, x, mask):
    """Linear in-proj + masked grouped-conv positional stem (dit.py:215-253)."""
    x = nn.linear(p["proj"], x)
    m3 = mask[..., None]
    h = jnp.where(m3, x, 0.0)
    h = nn.mish(nn.conv1d(p["conv1"], h, groups=cfg.conv_groups)) * m3.astype(x.dtype)
    h = nn.mish(nn.conv1d(p["conv2"], h, groups=cfg.conv_groups))
    h = jnp.where(m3, h, 0.0)
    return h + x


def _emb_proj(p, emb):
    return nn.linear(p["l2"], jax.nn.silu(nn.linear(p["l1"], emb)))


def _all_block_modulations(blocks, emb):
    """Precompute every block's adaLN-zero modulation in ONE wide einsum:
    (B, H) x (L, H, 6H) -> (L, B, 6H), threaded into the scan as xs — instead
    of L small latency-bound matmuls inside the scan body per step.

    When the params carry int8 modulation weights (quantize_modulations),
    the Pallas w8 kernel streams half the HBM bytes — the one shape where
    w8 measured a clear win (M=8 pure weight streaming, 2.7x; PERF.md
    "w8 kernels")."""
    lin = blocks["attn_norm"]["linear"]
    s = jax.nn.silu(emb)
    b = lin["b"]
    if "w_q" in lin:
        from smalltts_tpu.ops.pallas.w8 import (
            w8_matmul_all_layers,
            w8_matmul_ref,
        )

        if jax.default_backend() == "tpu":
            mod = w8_matmul_all_layers(s, lin["w_q"], lin["scale"])
        else:  # same compute order, XLA fallback (CPU tests / parity oracle)
            mod = jax.vmap(lambda wq, sc: w8_matmul_ref(s, wq, sc))(
                lin["w_q"], lin["scale"])
        return (mod.astype(jnp.float32)
                + b[:, None, :].astype(jnp.float32)).astype(s.dtype)
    mod = jnp.einsum(
        "bh,lhm->lbm", s, lin["w"].astype(s.dtype),
        preferred_element_type=jnp.float32
    )
    return (mod + b[:, None, :].astype(jnp.float32)).astype(s.dtype)


def quantize_modulations(params):
    """Backbone params -> same pytree with the stacked adaLN modulation
    weights stored int8 + per-channel scale (ops/pallas/w8.quantize_w8).

    Only the (L, H, 6H) modulation stack is touched: at serving batch the
    modulation matmul is pure weight streaming (M = batch), so int8 halves
    its HBM time; every other matmul measured <= 1.0x under w8 (PERF.md).
    Opt-in via SmallTTS(w8_modulation=True)."""
    from smalltts_tpu.ops.pallas.w8 import quantize_w8

    params = jax.tree.map(lambda x: x, params)  # shallow copy of the tree
    dit = params["dit"] if "dit" in params else params
    lin = dit["blocks"]["attn_norm"]["linear"]
    if "w_q" in lin:
        return params
    w_q, scale = quantize_w8(lin["w"])
    dit["blocks"]["attn_norm"]["linear"] = {
        "w_q": w_q, "scale": scale, "b": lin["b"],
    }
    return params


def _apply_adaln_zero(mod, x, eps=1e-6):
    """AdaLN-zero with a precomputed modulation (B, 6H)."""
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
    x = nn.layernorm_noaffine(x, eps) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


def _adaln_final(p, x, emb, eps=1e-6):
    return _adaln_final_from_mod(nn.linear(p["linear"], jax.nn.silu(emb)), x, eps)


def _adaln_final_from_mod(mod, x, eps=1e-6):
    scale, shift = jnp.split(mod, 2, axis=-1)
    return nn.layernorm_noaffine(x, eps) * (1 + scale[:, None]) + shift[:, None]


def precompute_step_modulations(p_dit, t_embs):
    """ALL sampling steps' adaLN modulations in ONE weight pass.

    The (L, H, 6H) modulation stack is ~132 MB bf16 at full size — 26% of
    the bytes the denoise loop streams PER STEP — yet its input is only the
    step's time embedding, and every step time is known before the loop
    (sampler.py already hoists the time-embedding MLP the same way).
    `t_embs` (S, H) -> (mods (L, S, 6H), final (S, 2H)); the loop indexes
    its step and broadcasts over batch. Works for both fp and w8-quantized
    modulation weights (_all_block_modulations dispatches on the leaf)."""
    emb = _emb_proj(p_dit["emb_proj"], t_embs)
    mods = _all_block_modulations(p_dit["blocks"], emb)
    final = nn.linear(p_dit["norm_out"]["linear"], jax.nn.silu(emb))
    return mods, final


def _project_cross(p_attn, cfg: DiTConfig, seq, which: str):
    """Per-block cross K/V projection: K is RMS-normed per head (dit.py:80-86).
    One fused (inner, 2*inner) matmul per source."""
    b, t, _ = seq.shape
    h, d = cfg.heads, cfg.head_dim
    kv = nn.linear(p_attn[f"kv_{which}"], seq)
    k, v = jnp.split(kv, 2, axis=-1)
    k = nn.rmsnorm(p_attn["k_norm_cross"], k.reshape(b, t, h, d), 1e-6)
    v = v.reshape(b, t, h, d)
    return k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)


def _self_qkv_gate(p_attn, cfg: DiTConfig, x, rope_freqs):
    """q/k_self/v_self (+ the attention output gate) from the same input.

    With fused serving weights (fuse_serving_projections) the gate folds
    into the SAME matmul as qkv — one (H, 4H) weight stream per block
    instead of (H, 3H) + (H, H)."""
    b, t, _ = x.shape
    h, d = cfg.heads, cfg.head_dim
    inner = h * d
    if "qkvg" in p_attn:
        qkvg = nn.linear(p_attn["qkvg"], x)
        qkv, gate = qkvg[..., : 3 * inner], qkvg[..., 3 * inner:]
    else:
        qkv = nn.linear(p_attn["qkv_self"], x)
        gate = nn.linear(p_attn["gate"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = nn.rmsnorm(p_attn["q_norm"], q.reshape(b, t, h, d), 1e-6)
    k = nn.rmsnorm(p_attn["k_norm"], k.reshape(b, t, h, d), 1e-6)
    v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)
    q = apply_rope_interleaved(q.transpose(0, 2, 1, 3), rope_freqs)
    k = apply_rope_interleaved(k.transpose(0, 2, 1, 3), rope_freqs)
    return q, k, v, gate


def _attend(p_attn, gate, q, k, v, mask, joint_key_mask):
    """One fused SDPA over [self | ref | text] keys + sigmoid gate (dit.py:110-119)."""
    out = nn.sdpa(q, k, v, key_mask=joint_key_mask)
    b, h, t, d = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    out = out * jax.nn.sigmoid(gate)
    out = nn.linear(p_attn["to_out"], out)
    return jnp.where(mask[..., None], out, 0.0)


def _ff(p, x):
    if "w13" in p:  # fused serving weights: one (H, 2F) stream
        ab = nn.linear(p["w13"], x)
        a, b = jnp.split(ab, 2, axis=-1)
        return nn.linear(p["w2"], jax.nn.silu(a) * b)
    return nn.linear(p["w2"], jax.nn.silu(nn.linear(p["w1"], x)) * nn.linear(p["w3"], x))


def fuse_serving_projections(params):
    """Backbone params -> same math, fewer weight streams per block:
    [qkv_self | gate] -> one (H, 4H) matmul, [ff.w1 | ff.w3] -> one
    (H, 2F) matmul. Output columns are computed identically (concatenation
    along the output axis does not change any dot product's reduction
    order), so this is a serving-time layout transform, not an
    approximation. Checkpoints stay in the standard split layout; apply at
    load (SmallTTS(fused_projections=True))."""
    params = jax.tree.map(lambda x: x, params)
    dit = params["dit"] if "dit" in params else params
    blocks = dict(dit["blocks"])
    attn = dict(blocks["attn"])
    if "qkvg" not in attn:
        qkv, gate = attn.pop("qkv_self"), attn.pop("gate")
        zeros_g = jnp.zeros(gate["w"].shape[:1] + gate["w"].shape[2:],
                            qkv["b"].dtype)
        attn["qkvg"] = {
            "w": jnp.concatenate([qkv["w"], gate["w"]], axis=-1),
            "b": jnp.concatenate([qkv["b"], zeros_g], axis=-1),
        }
    ff = dict(blocks["ff"])
    if "w13" not in ff:
        w1, w3 = ff.pop("w1"), ff.pop("w3")
        ff["w13"] = {
            "w": jnp.concatenate([w1["w"], w3["w"]], axis=-1),
            "b": jnp.concatenate([w1["b"], w3["b"]], axis=-1),
        }
    blocks["attn"], blocks["ff"] = attn, ff
    dit["blocks"] = blocks
    return params


def quantize_stream_weights(params):
    """Serving-time int8 quantization of the denoise scan's weight streams.

    The round-4 MFU profile (PERF.md) shows the 4-step denoise loop is
    weight-STREAM-bound: ~0.5 GB of DiT matmul weights cross HBM per step
    at small per-kernel shapes. This halves those bytes: the four leaves
    the cached scan actually threads (attn qkvg/to_out, ff w13/w2 — or
    their unfused variants) are stored int8 with a per-layer,
    per-output-channel symmetric scale; nn.linear dequantizes with a
    convert+multiply XLA fuses into the matmul read. Contrast with the
    REFUTED Pallas w8 kernels (PERF.md round-3: pallas_call is a
    scheduling barrier that repaid its streaming win 8x in lost overlap) —
    this keeps XLA in charge of overlap. Max per-channel quantization
    error is 0.5/127 of the channel's max |w| (~0.4%); waveform impact is
    tolerance-tested (tests/test_pallas.py::test_w8_stream_*).

    Checkpoints stay fp; apply at load via SmallTTS(w8_stream=True)."""
    params = jax.tree.map(lambda x: x, params)
    dit = params["dit"] if "dit" in params else params
    blocks = dict(dit["blocks"])

    def quant(lin):
        w = lin["w"]  # stacked (L, H, O) or flat (H, O)
        scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        out = {"w_q": w_q, "scale": scale.astype(jnp.float32)}
        if "b" in lin:
            out["b"] = lin["b"]
        return out

    attn = dict(blocks["attn"])
    for k in ("qkvg", "qkv_self", "gate", "to_out"):
        if k in attn:
            attn[k] = quant(attn[k])
    ff = dict(blocks["ff"])
    for k in ("w13", "w1", "w3", "w2"):
        if k in ff:
            ff[k] = quant(ff[k])
    blocks["attn"], blocks["ff"] = attn, ff
    dit["blocks"] = blocks
    return params


def _block_core(blk, cfg: DiTConfig, x, mod, mask, joint_key_mask, rope_freqs, kv: Tuple):
    """Shared block body; `mod` is this block's precomputed adaLN modulation;
    `kv` is (k_ref, v_ref, k_text, v_text) already projected."""
    norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = _apply_adaln_zero(mod, x)
    q, k_self, v_self, gate = _self_qkv_gate(blk["attn"], cfg, norm, rope_freqs)
    k = jnp.concatenate([k_self, kv[0], kv[2]], axis=2)
    v = jnp.concatenate([v_self, kv[1], kv[3]], axis=2)
    attn_out = _attend(blk["attn"], gate, q, k, v, mask, joint_key_mask)
    x = x + jnp.tanh(gate_msa)[:, None] * attn_out
    norm2 = nn.layernorm_noaffine(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    x = x + jnp.tanh(gate_mlp)[:, None] * _ff(blk["ff"], norm2)
    return x


# ----------------------------------------------------------------- public API


def _rope_slice(cfg: DiTConfig, seq_len: int) -> jax.Array:
    return jnp.asarray(rope_table_interleaved(seq_len, cfg.rot_dim))


def dit_forward(
    p,
    cfg: DiTConfig,
    x: jax.Array,
    ref_seq: jax.Array,
    ref_mask: jax.Array,
    phoneme_embedding: jax.Array,
    phonemes_mask: jax.Array,
    time_embedding: jax.Array,
    mask: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Full (uncached) forward: returns (hidden (B,T,H), features (B,L,T,H)).

    The stacked per-layer features (for the discriminator) are the scan's
    stacked outputs — free, unlike the reference's Python list append
    (dit.py:346-367).
    """
    x = _input_embed(p["input_embed"], cfg, x, mask)
    rope = _rope_slice(cfg, x.shape[1])
    phoneme_mem = nn.linear(p["phoneme_proj"], phoneme_embedding)
    phoneme_mem = jnp.where(phonemes_mask[..., None], phoneme_mem, 0.0)
    emb = _emb_proj(p["emb_proj"], time_embedding)
    joint_key_mask = jnp.concatenate([mask, ref_mask, phonemes_mask], axis=1)
    mods = _all_block_modulations(p["blocks"], emb)

    def body(carry, scanned):
        blk, mod = scanned
        kv_ref = _project_cross(blk["attn"], cfg, ref_seq, "ref")
        kv_text = _project_cross(blk["attn"], cfg, phoneme_mem, "text")
        out = _block_core(
            blk, cfg, carry, mod, mask, joint_key_mask, rope,
            (kv_ref[0], kv_ref[1], kv_text[0], kv_text[1]),
        )
        return out, out

    body_fn = jax.checkpoint(body) if cfg.remat else body
    # same xs pruning as the cached/cond-encode paths: the body reads only
    # attn + ff — the stacked adaLN modulation weights were consumed by
    # _all_block_modulations above and would otherwise ride the scan as
    # dead cargo (relying on XLA DCE, which the cached path measured as
    # incomplete)
    blocks_xs = {k: v for k, v in p["blocks"].items() if k != "attn_norm"}
    x, feats = lax.scan(body_fn, x, (blocks_xs, mods), unroll=cfg.scan_unroll)
    x = _adaln_final(p["norm_out"], x, emb)
    return x, feats.transpose(1, 0, 2, 3)


def dit_encode_cross_kv(
    p,
    cfg: DiTConfig,
    ref_seq: jax.Array,
    phoneme_embedding: jax.Array,
    phonemes_mask: jax.Array,
) -> CrossKV:
    """Precompute all-layer cross K/V once per utterance (dit.py:300-314)."""
    phoneme_mem = nn.linear(p["phoneme_proj"], phoneme_embedding)
    phoneme_mem = jnp.where(phonemes_mask[..., None], phoneme_mem, 0.0)

    def body(_, blk):
        k_ref, v_ref = _project_cross(blk["attn"], cfg, ref_seq, "ref")
        k_text, v_text = _project_cross(blk["attn"], cfg, phoneme_mem, "text")
        return None, (k_ref, v_ref, k_text, v_text)

    # thread only the cross-projection leaves (the qkv/ff stacks are the
    # bulk of the block pytree and are denoise-path-only)
    cross = {"attn": {k: v for k, v in p["blocks"]["attn"].items()
                      if k in ("kv_ref", "kv_text", "k_norm_cross")}}
    _, (k_ref, v_ref, k_text, v_text) = lax.scan(body, None, cross)
    return CrossKV(k_ref, v_ref, k_text, v_text)


def pack_fused_block(params):
    """Serving-time transform: add the Pallas whole-scan kernel's weight
    layout (ops/pallas/block.pack_block_weights) under blocks["pallas"].

    Originals are KEPT so buckets that exceed the kernel's VMEM budget
    (block.fits_vmem) fall back to the XLA scan — ~0.5 GB extra HBM at
    full size, a serving-only cost. Apply AFTER fuse_serving_projections.
    Opt-in via SmallTTS(fused_block=True) / SMALLTTS_PALLAS_BLOCK=1."""
    from smalltts_tpu.ops.pallas.block import pack_block_weights

    params = jax.tree.map(lambda x: x, params)
    dit = params["dit"] if "dit" in params else params
    blocks = dict(dit["blocks"])
    if "pallas" in blocks:
        return params
    if "qkvg" not in blocks["attn"]:
        raise ValueError("pack_fused_block requires fuse_serving_projections")
    h = blocks["attn"]["q_norm"]["scale"].shape[1]
    d = blocks["attn"]["q_norm"]["scale"].shape[2]
    blocks["pallas"] = pack_block_weights(blocks, h, d)
    dit["blocks"] = blocks
    return params


def _fused_block_scan(p, cfg: DiTConfig, x, mods, mask, ref_mask,
                      phonemes_mask, cached: CrossKV):
    """Route the layer scan through ops/pallas/block.fused_dit_scan."""
    from smalltts_tpu.ops.pallas import block as BK

    T = x.shape[1]
    k_cross = BK.pack_cross_kv(
        jnp.concatenate([cached.k_ref, cached.k_text], axis=3), cfg.head_dim)
    v_cross = BK.pack_cross_kv(
        jnp.concatenate([cached.v_ref, cached.v_text], axis=3), cfg.head_dim)
    cos, sin = BK.rope_tables(
        rope_table_interleaved(T, cfg.rot_dim), cfg.heads, cfg.head_dim, T)
    mods6 = jnp.stack(jnp.split(mods, 6, axis=-1), axis=1)
    cross_mask = jnp.concatenate([ref_mask, phonemes_mask], axis=1)
    self_bias = jnp.where(mask, 0.0, -1e9)[:, None, :].astype(jnp.float32)
    cross_bias = jnp.where(cross_mask, 0.0,
                           -1e9)[:, None, :].astype(jnp.float32)
    row_mask = mask[..., None].astype(x.dtype)
    return BK.fused_dit_scan(
        x, mods6, self_bias, cross_bias, row_mask,
        jnp.asarray(cos), jnp.asarray(sin), p["blocks"]["pallas"],
        k_cross, v_cross, heads=cfg.heads, head_dim=cfg.head_dim,
        hidden=cfg.hidden_dim, ff_dim=cfg.ff_dim,
        # off-TPU (CPU tests) the kernel runs in interpret mode — the
        # opt-in flag means nobody pays this without asking
        interpret=jax.default_backend() != "tpu")


def dit_forward_cached(
    p,
    cfg: DiTConfig,
    x: jax.Array,
    time_embedding: jax.Array,
    mask: jax.Array,
    cached: CrossKV,
    ref_mask: jax.Array,
    phonemes_mask: jax.Array,
    step_mods=None,
) -> jax.Array:
    """Denoise-step forward reusing the cross-KV cache (dit.py:316-327).

    `step_mods` = (mods (L, 6H), final (2H)) precomputed by
    precompute_step_modulations lets the sampler stream the adaLN
    modulation weights ONCE for all steps instead of once per step."""
    b = x.shape[0]
    x = _input_embed(p["input_embed"], cfg, x, mask)
    rope = _rope_slice(cfg, x.shape[1])
    joint_key_mask = jnp.concatenate([mask, ref_mask, phonemes_mask], axis=1)
    if step_mods is None:
        emb = _emb_proj(p["emb_proj"], time_embedding)
        mods = _all_block_modulations(p["blocks"], emb)
        final_mod = None
    else:
        mods_i, final_i = step_mods
        mods = jnp.broadcast_to(mods_i[:, None, :],
                                (mods_i.shape[0], b, mods_i.shape[-1]))
        final_mod = jnp.broadcast_to(final_i[None, :], (b, final_i.shape[-1]))

    if "pallas" in p["blocks"]:
        from smalltts_tpu.ops.pallas.block import fits_vmem

        if fits_vmem(x.shape[0], x.shape[1],
                     cached.k_ref.shape[3] + cached.k_text.shape[3],
                     cfg.heads, cfg.head_dim, cfg.hidden_dim, cfg.ff_dim):
            x = _fused_block_scan(p, cfg, x, mods, mask, ref_mask,
                                  phonemes_mask, cached)
            if final_mod is not None:
                return _adaln_final_from_mod(final_mod, x)
            return _adaln_final(p["norm_out"], x, emb)
        # bucket exceeds the kernel's VMEM budget: XLA scan fallback below

    # scan xs slices EVERY leaf per iteration — thread ONLY what the cached
    # body touches. The cross-KV projection weights (~88 MB, used only at
    # cond-encode time) and the modulation stack (~132 MB, already applied
    # via `mods`) would otherwise ride along every step.
    used_attn = {"qkvg", "qkv_self", "gate", "to_out", "q_norm", "k_norm"}
    blocks_scan = {
        "attn": {k: v for k, v in p["blocks"]["attn"].items()
                 if k in used_attn},
        "ff": p["blocks"]["ff"],
    }

    def body(carry, scanned):
        blk, mod, kv = scanned
        out = _block_core(blk, cfg, carry, mod, mask, joint_key_mask, rope, kv)
        return out, None

    x, _ = lax.scan(body, x, (blocks_scan, mods, tuple(cached)),
                    unroll=cfg.scan_unroll)
    if final_mod is not None:
        return _adaln_final_from_mod(final_mod, x)
    return _adaln_final(p["norm_out"], x, emb)
