"""Mixed-precision policy for training steps.

The reference trains under torch/accelerate autocast on CUDA (its DiT pins
RoPE out of autocast, reference: src/smalltts/models/backbone/dit.py:159 —
the tell that the surrounding training runs mixed-precision). The TPU-first
equivalent is simpler and fully explicit:

- master params, optimizer moments, and EMA stay float32 (the optimizer
  update is HBM-bound elementwise work; fp32 there costs bandwidth but
  keeps 330k-step accumulation exact);
- the forward/backward graph runs in bfloat16: params and float batch
  tensors are cast once at the top of the loss, so every matmul hits the
  MXU at its native bf16 rate and activation HBM traffic halves;
- loss reductions accumulate in float32 (ops/masking.masked_mse upcasts);
- RoPE rotates in float32 regardless (ops/rope.py), matching the
  reference's autocast exemption.

No loss scaling: bf16 shares float32's exponent range, so the fp16-era
underflow machinery the torch stack drags in is dead weight on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast every float leaf of a pytree to `dtype`; non-floats unchanged.

    Used at the top of a loss to produce the bf16 *compute view* of fp32
    master params — inside jit, so XLA fuses each cast into its first
    consumer and the view never round-trips through HBM at full width.
    """
    dtype = jnp.dtype(dtype)

    def leaf(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(leaf, tree)
