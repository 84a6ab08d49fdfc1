"""Rotary position embeddings.

Two conventions coexist in the reference model family and must be kept
numerically distinct:

1. *Interleaved-pair* RoPE used by the DiT backbone
   (reference: src/smalltts/models/backbone/dit.py:138-173): the frequency
   table duplicates each frequency -> [f0, f0, f1, f1, ...]; rotation pairs
   adjacent lanes (x0, x1), (x2, x3), ... Only the first `rot_dim` head dims
   rotate (DiT: 64 of 120).

2. *Complex-pair* RoPE used by the text/style encoders
   (reference: src/smalltts/models/backbone/phonemes.py:70-84, style.py:13-25):
   adjacent lanes form complex numbers multiplied by e^{i t theta_j}.

Mathematically both rotate pairs (even, odd) lanes; the difference is the
DiT path stores duplicated freqs and uses the rotate-half trick while the
encoders reconstruct cos/sin from a complex table. The actual lane pairing is
identical — (2i, 2i+1) — so one fused primitive serves both; we keep separate
table builders for checkpoint/ONNX parity of the precomputed buffers.

All tables are precomputed as static arrays (closed over by jit), never
recomputed per step on host like the reference's ONNX feed
(src/smalltts/infer/onnx.py:42-47).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rope_table_interleaved(max_seq: int, dim: int, theta: float = 1e4) -> np.ndarray:
    """DiT-style table: (max_seq, dim) with duplicated freqs [f0,f0,f1,f1,...]."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(max_seq, dtype=np.float32)
    freqs = np.einsum("i,j->ij", t, inv_freq)  # (T, dim/2)
    freqs = np.stack([freqs, freqs], axis=-1).reshape(max_seq, dim)
    return freqs


def rope_table_cos_sin(max_seq: int, head_dim: int, theta: float = 1e4):
    """Encoder-style table: cos/sin of angle t*theta_j, each (max_seq, head_dim/2)."""
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    )
    t = np.arange(max_seq, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # (T, head_dim/2)
    return np.cos(freqs), np.sin(freqs)


def _rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """[x0, x1, x2, x3, ...] -> [-x1, x0, -x3, x2, ...] (pairs of adjacent lanes)."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    a, b = x2[..., 0], x2[..., 1]
    return jnp.stack([-b, a], axis=-1).reshape(x.shape)


def apply_rope_interleaved(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """Apply interleaved RoPE to the leading `freqs.shape[-1]` lanes of x.

    x: (..., T, head_dim); freqs: (T, rot_dim) duplicated-freq table slice.
    Lanes past rot_dim pass through unrotated (DiT rotates 64 of 120,
    reference: dit.py:169-171).
    """
    rot_dim = freqs.shape[-1]
    xr, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    # the rotation itself runs in float32 and casts back: the reference
    # pins RoPE out of autocast (dit.py:159 @autocast enabled=False) —
    # position information at long seq lens degrades fastest in bf16
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    xf = xr.astype(jnp.float32)
    xr = (xf * cos + _rotate_half_interleaved(xf) * sin).astype(x.dtype)
    return jnp.concatenate([xr, x_pass], axis=-1) if x_pass.shape[-1] else xr


def apply_rope_pairs(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Complex-pair RoPE over the full head dim.

    x: (B, T, H, D); cos/sin: (T, D/2). Pairs (x[..., 2i], x[..., 2i+1]) are
    rotated by angle t*theta_i — the JAX equivalent of the reference's
    view_as_complex multiply (phonemes.py:80-84).
    """
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    re, im = x2[..., 0], x2[..., 1]
    cos = cos[None, :, None, :].astype(x.dtype)
    sin = sin[None, :, None, :].astype(x.dtype)
    out_re = re * cos - im * sin
    out_im = re * sin + im * cos
    return jnp.stack([out_re, out_im], axis=-1).reshape(x.shape)
