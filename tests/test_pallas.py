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
