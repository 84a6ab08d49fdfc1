"""Checkpoint validator: key/shape diffing + forward + cached-path parity.

Capability parity with the reference validator (reference:
src/scripts/test_checkpoint.py:13-135): loads a torch teacher/DMD checkpoint
(or our .npz), reports missing / unexpected / shape-mismatched keys against a
fresh model, then runs the full forward, the cached-inference split
(encode_conditions + denoise_step), and the stacked-features forward with
shape asserts.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load_sidecar(path: str, convert):
    from smalltts_tpu.utils import checkpoint as ckpt

    if path.endswith((".pt", ".pth", ".bin")):
        import torch

        from smalltts_tpu.utils.torch_convert import state_dict_to_numpy

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return convert(state_dict_to_numpy(sd))
    return ckpt.load_pytree(path)


def _validate_sidecar(kind: str, path: str) -> None:
    """Key/shape diff + forward smoke for the dmd_checkpoints sidecars
    (reference saves ASR/SV/disc next to the student,
    src/scripts/train/dmd2/distill.py:465-479)."""
    import jax
    import jax.numpy as jnp

    from smalltts_tpu.utils import torch_convert as tc
    from smalltts_tpu.utils.checkpoint import flatten_pytree

    rng = np.random.RandomState(0)
    if kind == "asr":
        from smalltts_tpu.models.asr import ASRConfig, asr_forward, init_asr

        cfg = ASRConfig()
        reference = jax.eval_shape(lambda k: init_asr(k, cfg), jax.random.PRNGKey(0))
        params = _load_sidecar(path, tc.convert_asr_state_dict)
        fwd = lambda p: asr_forward(  # noqa: E731
            p, cfg, jnp.asarray(rng.randn(2, 12, 64), jnp.float32),
            jnp.asarray([12, 8], jnp.int32),
        )[0]
    elif kind == "sv":
        from smalltts_tpu.models.sv import SVConfig, init_sv, sv_forward

        cfg = SVConfig()
        reference = jax.eval_shape(lambda k: init_sv(k, cfg), jax.random.PRNGKey(0))
        params = _load_sidecar(path, tc.convert_sv_state_dict)
        fwd = lambda p: sv_forward(  # noqa: E731
            p, cfg, jnp.asarray(rng.randn(2, 20, 64), jnp.float32),
            jnp.asarray([20, 11], jnp.int32),
        )[0]
    elif kind == "disc":
        from smalltts_tpu.models.discriminator import (
            DiscriminatorConfig,
            discriminator_forward,
            init_discriminator,
        )

        cfg = DiscriminatorConfig()
        reference = jax.eval_shape(
            lambda k: init_discriminator(k, cfg), jax.random.PRNGKey(0)
        )
        params = _load_sidecar(path, tc.convert_discriminator_state_dict)
        fwd = lambda p: discriminator_forward(  # noqa: E731
            p, cfg,
            jnp.asarray(rng.randn(2, 3, 10, cfg.transformer_dim), jnp.float32),
            jnp.asarray(rng.randn(2, 10, cfg.latent_dim), jnp.float32),
            jnp.asarray(rng.randn(2, 6, cfg.ref_dim), jnp.float32),
            jnp.ones((2, 6), bool), jnp.ones((2, 10), bool),
            jnp.asarray(rng.randint(1, cfg.vocab, (2, 5)), jnp.int32),
            jnp.asarray([0.3, 0.8], jnp.float32),
        )[0]
    else:
        raise ValueError(kind)

    ref_flat = flatten_pytree(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), reference)
    )
    got_flat = flatten_pytree(params)
    missing = sorted(set(ref_flat) - set(got_flat))
    # converted speechbrain SV carries the ASP TDNN batchnorm as an extra
    unexpected = sorted(
        k for k in set(got_flat) - set(ref_flat) if "attn_tdnn_bn" not in k
    )
    mismatched = sorted(
        k for k in set(ref_flat) & set(got_flat)
        if tuple(np.shape(ref_flat[k])) != tuple(np.shape(got_flat[k]))
    )
    print(f"{kind}: missing {len(missing)}, unexpected {len(unexpected)}, "
          f"shape mismatches {len(mismatched)}")
    for k in (missing + unexpected + mismatched)[:20]:
        print(f"  ! {k}")
    if missing or mismatched:
        sys.exit(1)
    out = fwd(jax.tree.map(jnp.asarray, params))
    assert np.isfinite(np.asarray(out)).all(), f"{kind} forward produced non-finite"
    print(f"{kind} forward OK: {np.shape(out)}")
    print("checkpoint valid")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help=".pt torch state_dict or .npz pytree")
    ap.add_argument("--kind", default="backbone",
                    choices=["backbone", "asr", "sv", "disc"],
                    help="which model family the checkpoint belongs to "
                         "(dmd_checkpoints sidecars: asr/sv/disc)")
    ap.add_argument("--convert", metavar="OUT_NPZ", default=None,
                    help="after validation, write the converted params as a "
                         "native .npz WITH embedded architecture metadata "
                         "(utils/config_io.backbone_meta) — the file "
                         "SmallTTS(checkpoint=...) autoconfigures from; "
                         "certify.py's onnx_pipeline stage consumes these "
                         "(backbone checkpoints only)")
    args = ap.parse_args()

    if args.kind != "backbone":
        if args.convert:
            sys.exit("--convert supports backbone checkpoints only "
                     "(sidecars carry no config metadata)")
        _validate_sidecar(args.kind, args.checkpoint)
        return

    import jax
    import jax.numpy as jnp

    from smalltts_tpu.models.backbone import (
        BackboneConfig,
        backbone_forward,
        denoise_step,
        encode_conditions,
        init_backbone,
    )
    from smalltts_tpu.utils import checkpoint as ckpt
    from smalltts_tpu.utils.checkpoint import flatten_pytree

    cfg = BackboneConfig()
    reference = jax.eval_shape(
        lambda k: init_backbone(k, cfg), jax.random.PRNGKey(0)
    )
    ref_flat = flatten_pytree(jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), reference))

    if args.checkpoint.endswith((".pt", ".pth", ".bin")):
        params = ckpt.load_reference_backbone_checkpoint(args.checkpoint)
    else:
        params = ckpt.load_pytree(args.checkpoint)
    got_flat = flatten_pytree(params)

    missing = sorted(set(ref_flat) - set(got_flat))
    unexpected = sorted(set(got_flat) - set(ref_flat))
    mismatched = sorted(
        k for k in set(ref_flat) & set(got_flat)
        if tuple(np.shape(ref_flat[k])) != tuple(np.shape(got_flat[k]))
    )
    print(f"missing keys: {len(missing)}")
    for k in missing[:20]:
        print(f"  - {k}")
    print(f"unexpected keys: {len(unexpected)}")
    for k in unexpected[:20]:
        print(f"  + {k}")
    print(f"shape mismatches: {len(mismatched)}")
    for k in mismatched[:20]:
        print(f"  ! {k}: expected {np.shape(ref_flat[k])}, got {np.shape(got_flat[k])}")
    if missing or mismatched:
        sys.exit(1)

    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.RandomState(0)
    b, t_len, r, p = 2, 24, 12, 16
    noised = jnp.asarray(rng.randn(b, t_len, 64), jnp.float32)
    ref_lat = jnp.asarray(rng.randn(b, r, 64), jnp.float32)
    ref_lens = jnp.asarray([r, r // 2], jnp.int32)
    mask = jnp.ones((b, t_len), bool)
    phonemes = jnp.asarray(rng.randint(1, cfg.vocab_size, (b, p)), jnp.int32)
    ph_mask = jnp.ones((b, p), bool)
    t = jnp.asarray([0.4, 0.9], jnp.float32)

    vel, feats = backbone_forward(
        params, cfg, noised, ref_lat, ref_lens, mask, phonemes, ph_mask, t,
        return_features=True,
    )
    assert vel.shape == (b, t_len, 64), vel.shape
    assert feats.shape == (b, cfg.dit.n_blocks, t_len, cfg.hidden_dim), feats.shape
    print(f"full forward OK: velocity {vel.shape}, features {feats.shape}")

    cond = encode_conditions(params, cfg, ref_lat, ref_lens, phonemes, ph_mask)
    vel_cached = denoise_step(params, cfg, noised, mask, t, cond)
    err = float(jnp.abs(vel_cached - vel).max())
    assert err < 1e-4, f"cached path diverges from full forward: {err}"
    print(f"cached-inference path OK (max |diff| = {err:.2e})")
    print("checkpoint valid")

    if args.convert:
        from smalltts_tpu.utils.config_io import backbone_meta

        ckpt.save_pytree(args.convert, params, meta=backbone_meta(cfg))
        print(f"converted -> {args.convert} (with embedded config metadata)")


if __name__ == "__main__":
    main()
