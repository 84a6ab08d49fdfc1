"""Full-backbone parity vs the reference DiTModel (328M params, full size).

Gated behind RUN_SLOW=1 for the heavy end-to-end check; the TimeEmbedding
parity test always runs.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from oracles import import_reference


def test_time_embedding_parity():
    ref_model = import_reference("smalltts.models.backbone.model")
    torch.manual_seed(3)
    ref = ref_model.TimeEmbedding(960).eval()

    from smalltts_tpu.models.backbone import time_embedding
    from smalltts_tpu.utils.torch_convert import _lin, state_dict_to_numpy

    sd = state_dict_to_numpy(ref.state_dict())
    params = {"l1": _lin(sd, "mlp.0"), "l2": _lin(sd, "mlp.2")}

    t = np.array([0.0, 0.25, 0.7, 1.0], dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(t)).numpy()
    ours = np.asarray(time_embedding(params, jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1", reason="full 328M-param parity; RUN_SLOW=1"
)
def test_full_backbone_parity():
    ref_model = import_reference("smalltts.models.backbone.model")
    torch.manual_seed(4)
    ref = ref_model.DiTModel(64).eval()

    from smalltts_tpu.models.backbone import (
        BackboneConfig,
        backbone_forward,
        denoise_step,
        encode_conditions,
    )
    from smalltts_tpu.utils.torch_convert import (
        convert_backbone_state_dict,
        state_dict_to_numpy,
    )

    cfg = BackboneConfig()
    params = convert_backbone_state_dict(state_dict_to_numpy(ref.state_dict()))

    rng = np.random.RandomState(4)
    b, t_len, r, p = 2, 24, 12, 16
    noised = rng.randn(b, t_len, 64).astype(np.float32)
    ref_latents = rng.randn(b, r, 64).astype(np.float32)
    ref_lengths = np.array([r, 7], dtype=np.int64)
    mask = np.ones((b, t_len), dtype=bool)
    mask[1, 18:] = False
    phonemes = rng.randint(1, 198, size=(b, p)).astype(np.int64)
    ph_mask = np.ones((b, p), dtype=bool)
    ph_mask[0, 10:] = False
    phonemes[0, 10:] = 0
    tt = np.array([0.4, 0.9], dtype=np.float32)

    with torch.no_grad():
        ref_vel = ref(
            torch.from_numpy(noised), torch.from_numpy(ref_latents),
            torch.from_numpy(ref_lengths), torch.from_numpy(mask),
            torch.from_numpy(phonemes), torch.from_numpy(ph_mask),
            torch.from_numpy(tt),
        ).numpy()

    ours = np.asarray(
        backbone_forward(
            params, cfg, jnp.asarray(noised), jnp.asarray(ref_latents),
            jnp.asarray(ref_lengths), jnp.asarray(mask), jnp.asarray(phonemes),
            jnp.asarray(ph_mask), jnp.asarray(tt),
        )
    )
    valid = mask[..., None]
    np.testing.assert_allclose(ours * valid, ref_vel * valid, rtol=5e-4, atol=5e-4)

    # cached-inference split == full forward (the ONNX-export parity)
    cond = encode_conditions(
        params, cfg, jnp.asarray(ref_latents), jnp.asarray(ref_lengths),
        jnp.asarray(phonemes), jnp.asarray(ph_mask),
    )
    ours_cached = np.asarray(
        denoise_step(params, cfg, jnp.asarray(noised), jnp.asarray(mask), jnp.asarray(tt), cond)
    )
    np.testing.assert_allclose(ours_cached * valid, ours * valid, rtol=1e-5, atol=1e-5)
