"""Pallas TPU kernels: int8-weight (w8a-bf16) matmuls for the denoise loop.

Why: at serving batch sizes the 4-step denoise loop is weight-bandwidth
bound — each step streams ~410 MB of bf16 DiT weights from HBM (PERF.md
"Denoise decomposition"). Storing weights as int8 + per-output-channel fp32
scales halves the streamed bytes. Plain XLA cannot realize the win: it
materializes the full dequantized bf16 copy before the matmul (PERF.md
"int8 weight storage", measured 1.02x). These kernels dequantize per-block
in VMEM — the int8 tile is DMA'd from HBM, converted on the VPU, and fed
to the MXU without ever writing a bf16 copy back to HBM.

Two entry points:

* `w8_matmul(x, w_q, scale)` — plain (K, N) weight, whole-array VMEM
  blocks (DiT dims — 960/2400/2880 — are not multiples of 128, so full-dim
  blocks are the only legal tiling; every operand fits VMEM comfortably:
  the largest weight is (960, 5760) int8 = 5.3 MB).
* `w8_matmul_stacked(x, w_q, scale, idx)` — weight stacked (L, K, N) with a
  runtime layer index, for use INSIDE `lax.scan` over blocks. The index
  travels as a scalar-prefetch argument and selects the block in the
  BlockSpec index_map, so Pallas DMAs the int8 layer slice STRAIGHT from
  the stacked HBM buffer. (Letting scan's xs-slicing feed a pallas_call
  would materialize the slice: an int8 read+write = the same HBM bytes as
  reading bf16 once — the entire win gone.)

Quantization is symmetric per-output-channel (scale = amax/127 over the
input dim): int8 values convert to bf16 exactly (|q| <= 127 needs 7
significand bits), so the only error vs an fp matmul is the weight
rounding itself.

Numerics: MXU dot in bf16 with fp32 accumulation, scales applied in fp32
to the accumulator — identical compute order to `w8_matmul_ref`, which is
the XLA fallback on CPU and the parity oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ------------------------------------------------------------------ quantize


def quantize_w8(w: jax.Array):
    """(K, N) or (L, K, N) float weight -> (w_q int8, scale f32 (..., N)).

    Symmetric per-output-channel: scale = amax(|w|, axis=-2) / 127.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def w8_matmul_ref(x: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    """XLA reference/fallback: same compute order as the kernels."""
    acc = jnp.dot(
        x, w_q.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return (acc * scale[None, :].astype(jnp.float32)).astype(x.dtype)


# ------------------------------------------------------------------- kernels


def _w8_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)  # int8 -> bf16 on the VPU, VMEM-resident
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def w8_matmul(
    x: jax.Array,      # (M, K) bf16/f32
    w_q: jax.Array,    # (K, N) int8
    scale: jax.Array,  # (N,) f32
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    kk, n = w_q.shape
    assert k == kk and scale.shape == (n,)
    return pl.pallas_call(
        _w8_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=x.size * x.dtype.itemsize + w_q.size + 4 * n
            + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, scale[None, :])


def _w8_stacked_kernel(idx_ref, x_ref, w_ref, s_ref, o_ref):
    del idx_ref  # consumed by the index_maps
    x = x_ref[:]
    w = w_ref[0].astype(x.dtype)
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, 0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def w8_matmul_stacked(
    x: jax.Array,      # (M, K)
    w_q: jax.Array,    # (L, K, N) int8 — full stacked buffer stays in HBM
    scale: jax.Array,  # (L, N) f32
    idx: jax.Array,    # scalar int32 layer index
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    l, kk, n = w_q.shape
    assert k == kk and scale.shape == (l, n)
    # scale travels as (L, 1, N): the TPU lowering requires the trailing two
    # block dims be (8, 128)-divisible OR equal to the array dims — (1, N)
    # blocks of an (L, N) array are neither
    scale3 = scale[:, None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i, idx_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, n), lambda i, idx_ref: (idx_ref[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, idx_ref: (idx_ref[0], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n), lambda i, idx_ref: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _w8_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=x.size * x.dtype.itemsize + k * n + 4 * n
            + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), x, w_q, scale3)


def _w8_all_layers_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]
    w = w_ref[0].astype(x.dtype)
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[0] = (acc * s_ref[0, 0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def w8_matmul_all_layers(
    x: jax.Array,      # (M, K)
    w_q: jax.Array,    # (L, K, N) int8
    scale: jax.Array,  # (L, N) f32
    interpret: bool = False,
) -> jax.Array:
    """(M, K) x every layer of (L, K, N) -> (L, M, N).

    For the HOISTED adaLN modulation matmul (dit._all_block_modulations):
    grid over L, each program DMAs one int8 layer slice into VMEM,
    dequantizes on the VPU, and hits the MXU — the 2.7x M=8 win from
    PERF.md "w8 kernels" without any scan plumbing."""
    m, k = x.shape
    l, kk, n = w_q.shape
    assert k == kk and scale.shape == (l, n), (w_q.shape, scale.shape)
    return pl.pallas_call(
        _w8_all_layers_kernel,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * l * m * k * n,
            bytes_accessed=l * (x.size * x.dtype.itemsize + k * n + 4 * n
                                + m * n * x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, scale[:, None, :])
