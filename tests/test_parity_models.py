"""Numerical parity of the JAX models vs the reference torch implementation.

Each test builds the reference torch module, converts its random-init weights
through our converter, runs both on identical inputs and compares outputs.
This is the rebuild's equivalent of the reference's checkpoint validator
(reference: src/scripts/test_checkpoint.py:44-135).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from oracles import import_reference
from smalltts_tpu.models.encoder import EncoderConfig
from smalltts_tpu.models.dit import (
    DiTConfig,
    dit_encode_cross_kv,
    dit_forward,
    dit_forward_cached,
)
from smalltts_tpu.utils.torch_convert import (
    convert_dit_state_dict,
    convert_style_encoder_state_dict,
    convert_text_encoder_state_dict,
    state_dict_to_numpy,
)

RTOL = 2e-4
ATOL = 2e-4


def _np(x):
    return np.asarray(x)


@pytest.fixture(scope="module")
def ref_phonemes():
    return import_reference("smalltts.models.backbone.phonemes")


@pytest.fixture(scope="module")
def ref_style():
    return import_reference("smalltts.models.backbone.style")


@pytest.fixture(scope="module")
def ref_dit():
    return import_reference("smalltts.models.backbone.dit")


def test_text_encoder_parity(ref_phonemes):
    torch.manual_seed(0)
    cfg = EncoderConfig(model_size=128, num_layers=2, num_heads=4,
                        intermediate_size=256, norm_eps=1e-6)
    ref = ref_phonemes.TextEncoder(
        vocab_size=50, model_size=128, num_layers=2, num_heads=4,
        intermediate_size=256, norm_eps=1e-6,
    ).eval()
    params = convert_text_encoder_state_dict(state_dict_to_numpy(ref.state_dict()))

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 50, size=(2, 12))
    mask = np.ones((2, 12), dtype=bool)
    mask[1, 7:] = False

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids), torch.from_numpy(mask)).numpy()

    from smalltts_tpu.models.text_encoder import text_encoder

    ours = _np(text_encoder(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    # positions attending to padded keys differ only through the masked path;
    # compare valid positions (padded-query rows in torch carry uniform-softmax
    # garbage that downstream masking discards)
    np.testing.assert_allclose(ours[0], ref_out[0], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(ours[1, :7], ref_out[1, :7], rtol=RTOL, atol=ATOL)


def test_style_encoder_parity(ref_style):
    torch.manual_seed(1)
    ref = ref_style.StyleEncoder(out_dim=960).eval()
    params = convert_style_encoder_state_dict(state_dict_to_numpy(ref.state_dict()))

    rng = np.random.RandomState(1)
    latents = rng.randn(2, 16, 64).astype(np.float32)
    lengths = np.array([16, 9], dtype=np.int64)

    with torch.no_grad():
        ref_seq, ref_mask = ref(torch.from_numpy(latents), torch.from_numpy(lengths))

    from smalltts_tpu.models.style_encoder import style_encoder

    ours_seq, ours_mask = style_encoder(params, jnp.asarray(latents), jnp.asarray(lengths))
    np.testing.assert_array_equal(_np(ours_mask), ref_mask.numpy())
    np.testing.assert_allclose(_np(ours_seq), ref_seq.numpy(), rtol=RTOL, atol=ATOL)


def _small_dit_pair(ref_dit):
    """Reference DiT + converted params, small config (head_dim must be >= 64
    because the reference hardcodes RotaryEmbedding(64), dit.py:267)."""
    torch.manual_seed(2)
    ref = ref_dit.DiT(latent_dim=64, phoneme_dim=96, hidden_dim=512, n_blocks=2).eval()
    cfg = DiTConfig(latent_dim=64, phoneme_dim=96, hidden_dim=512, n_blocks=2)
    params = convert_dit_state_dict(state_dict_to_numpy(ref.state_dict()))
    return ref, cfg, params


def _dit_inputs():
    rng = np.random.RandomState(2)
    b, t, r, p = 2, 20, 8, 10
    x = rng.randn(b, t, 64).astype(np.float32)
    ref_seq = rng.randn(b, r, 512).astype(np.float32)
    ref_mask = np.ones((b, r), dtype=bool)
    ref_mask[1, 5:] = False
    ph = rng.randn(b, p, 96).astype(np.float32)
    ph_mask = np.ones((b, p), dtype=bool)
    ph_mask[0, 6:] = False
    t_emb = rng.randn(b, 512).astype(np.float32)
    mask = np.ones((b, t), dtype=bool)
    mask[1, 15:] = False
    return x, ref_seq, ref_mask, ph, ph_mask, t_emb, mask


def test_dit_forward_parity(ref_dit):
    ref, cfg, params = _small_dit_pair(ref_dit)
    x, ref_seq, ref_mask, ph, ph_mask, t_emb, mask = _dit_inputs()

    with torch.no_grad():
        ref_out, ref_feats = ref(
            torch.from_numpy(x), torch.from_numpy(ref_seq), torch.from_numpy(ref_mask),
            torch.from_numpy(ph), torch.from_numpy(ph_mask), torch.from_numpy(t_emb),
            torch.from_numpy(mask), get_stacked_transformer_features=True,
        )

    ours, feats = dit_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(ref_seq), jnp.asarray(ref_mask),
        jnp.asarray(ph), jnp.asarray(ph_mask), jnp.asarray(t_emb), jnp.asarray(mask),
    )
    valid = mask[..., None]
    np.testing.assert_allclose(
        _np(ours) * valid, ref_out.numpy() * valid, rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        _np(feats) * valid[:, None], ref_feats.numpy() * valid[:, None],
        rtol=RTOL, atol=ATOL,
    )


def test_dit_cached_path_matches_full(ref_dit):
    """encode_cross_kv + forward_cached == full forward (the ONNX-split parity,
    reference: src/scripts/test_checkpoint.py:95-135)."""
    ref, cfg, params = _small_dit_pair(ref_dit)
    x, ref_seq, ref_mask, ph, ph_mask, t_emb, mask = _dit_inputs()

    full, _ = dit_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(ref_seq), jnp.asarray(ref_mask),
        jnp.asarray(ph), jnp.asarray(ph_mask), jnp.asarray(t_emb), jnp.asarray(mask),
    )
    cached = dit_encode_cross_kv(params, cfg, jnp.asarray(ref_seq), jnp.asarray(ph), jnp.asarray(ph_mask))
    out = dit_forward_cached(
        params, cfg, jnp.asarray(x), jnp.asarray(t_emb), jnp.asarray(mask),
        cached, jnp.asarray(ref_mask), jnp.asarray(ph_mask),
    )
    valid = mask[..., None]
    np.testing.assert_allclose(_np(out) * valid, _np(full) * valid, rtol=1e-5, atol=1e-5)
