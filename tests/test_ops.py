"""Core math parity: noise schedule, masks, RoPE vs the reference torch code."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smalltts_tpu.ops.schedule import apply_noise, get_alpha_sigma, x_pred_from_velocity
from smalltts_tpu.ops.masking import length_mask, masked_mse


def test_alpha_sigma_matches_reference_formula():
    torch = pytest.importorskip("torch")
    from oracles import import_reference

    ref_utils = import_reference("smalltts.train.utils")

    t = np.linspace(0.0, 1.0, 33).astype(np.float32)
    ours_a, ours_s = get_alpha_sigma(jnp.asarray(t))
    ref_a, ref_s = ref_utils.get_alpha_sigma(torch.from_numpy(t))
    np.testing.assert_allclose(np.asarray(ours_a), ref_a.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_s), ref_s.numpy(), atol=1e-5)
    # alpha^2 + sigma^2 == 1
    np.testing.assert_allclose(
        np.asarray(ours_a) ** 2 + np.asarray(ours_s) ** 2, 1.0, atol=1e-6
    )


def test_apply_noise_and_xpred_roundtrip():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 10, 64))
    t = jnp.array([0.3, 0.9])
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    noised, vel = apply_noise(x, t, noise)
    # alpha*x_t - sigma*v == alpha^2 x + as e - as e + sigma^2 x == x
    x_rec = x_pred_from_velocity(noised, vel, t)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)


def test_length_mask():
    m = length_mask(jnp.array([0, 2, 5]), 4)
    expected = np.array(
        [[False] * 4, [True, True, False, False], [True] * 4]
    )
    np.testing.assert_array_equal(np.asarray(m), expected)


def test_masked_mse_ignores_padding():
    pred = jnp.ones((1, 4, 2))
    target = jnp.zeros((1, 4, 2))
    mask = jnp.array([[True, True, False, False]])
    # error 1.0 on each of 2x2 valid elements -> mean 1.0
    assert float(masked_mse(pred, target, mask)) == pytest.approx(1.0)


def test_rope_interleaved_matches_reference():
    torch = pytest.importorskip("torch")
    from oracles import import_reference

    ref_dit = import_reference("smalltts.models.backbone.dit")
    from smalltts_tpu.ops.rope import apply_rope_interleaved, rope_table_interleaved

    rot = ref_dit.RotaryEmbedding(64, max_seq=128)
    freqs, _ = rot.forward_from_seq_len(32)  # (1, 32, 64)

    x = np.random.RandomState(0).randn(2, 8, 32, 120).astype(np.float32)
    ref_out = ref_dit.apply_rotary_pos_emb(torch.from_numpy(x), freqs, 1.0).numpy()

    table = rope_table_interleaved(32, 64)
    np.testing.assert_allclose(table, freqs[0].numpy(), atol=1e-5)
    ours = apply_rope_interleaved(jnp.asarray(x), jnp.asarray(table))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-5)


def test_rope_pairs_matches_reference_complex():
    torch = pytest.importorskip("torch")
    from oracles import import_reference

    ref_ph = import_reference("smalltts.models.backbone.phonemes")
    from smalltts_tpu.ops.rope import apply_rope_pairs, rope_table_cos_sin

    head_dim, seq = 128, 16
    freqs_cis = ref_ph.precompute_freqs_cis_complex(head_dim, 64)[:seq]
    x = np.random.RandomState(1).randn(2, seq, 4, head_dim).astype(np.float32)
    ref_out = ref_ph.apply_rotary_emb(torch.from_numpy(x), freqs_cis).numpy()

    cos, sin = rope_table_cos_sin(seq, head_dim)
    ours = apply_rope_pairs(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-5)
