"""Corpus experiment: does the MeanFlow boundary condition (train r = t
against the teacher's instantaneous velocity with prob p) fix the IMF
student's weak instantaneous path without costing few-step quality?

Reuses the synthetic-corpus harness from tests/test_imf_quality.py: train
codec -> teacher once, then one IMF student per boundary_prob, scoring
mel-distance (vs ground truth; codec floor printed) and SV cosine for
IMF-1, IMF-2, and the checkpoint served through the gated DMD-4
recurrence. The p = 0.0 column is the pre-change baseline (measured
2026-08-17: imf_2 6.968 / imf_1 7.178 / under-dmd4 7.912, floor 6.632).

Usage: JAX_PLATFORMS=cpu python scripts/exp_imf_boundary.py [p ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the axon plugin clobbers the env


def main():
    if sys.argv[1:2] in (["-h"], ["--help"]):
        print(__doc__.strip())
        return
    probs = [float(a) for a in sys.argv[1:]] or [0.0, 0.25, 0.5]

    from test_imf_quality import (  # noqa: E402
        _build_corpus_and_models,
        _sv_embed_fn,
        _train_imf,
    )

    from smalltts_tpu.infer.sampler import _sample_loop
    from smalltts_tpu.models.backbone import encode_conditions
    from smalltts_tpu.models.codec import codec_decode
    from smalltts_tpu.ops.masking import length_mask
    from smalltts_tpu.train.imf import ImfConfig, imf_sample
    from smalltts_tpu.utils.metrics import mel_distance

    utts, cp, batch, teacher, cfg, codec_cfg = _build_corpus_and_models()
    embed = _sv_embed_fn()

    floor = float(np.mean([
        mel_distance(u["wav"][: len(u["rec_floor"])], u["rec_floor"])
        for u in utts]))
    print(f"codec floor mel={floor:.3f}", flush=True)

    def cond_for(params, i):
        return encode_conditions(
            params, cfg,
            batch["ref_latents"][i:i + 1], batch["ref_latents_lengths"][i:i + 1],
            batch["phonemes"][i:i + 1],
            length_mask(batch["phonemes_lengths"][i:i + 1],
                        batch["phonemes"].shape[1]),
        )

    def evaluate(sample_fn):
        mels, svs = [], []
        for i, u in enumerate(utts):
            T = u["latents"].shape[0]
            lat = sample_fn(i, T, jax.random.PRNGKey(100 + i))
            audio = np.asarray(codec_decode(
                cp, jnp.asarray(lat, jnp.float32), codec_cfg))[0, 0]
            gt = u["wav"][: len(audio)]
            audio = audio[: len(gt)]
            mels.append(mel_distance(gt, audio))
            svs.append(float(embed(gt) @ embed(audio)))
        return float(np.mean(mels)), float(np.mean(svs))

    t_max = int(batch["latents"].shape[1])
    for p in probs:
        student = _train_imf(
            teacher, batch, cfg,
            imf_cfg=ImfConfig(rollout_substeps=4, boundary_prob=p))

        def imf_k(k):
            return lambda i, T, key: imf_sample(
                student, cfg, cond_for(student, i),
                jnp.full((1,), T, jnp.int32), t_max, key, num_steps=k)[:, :T]

        def dmd4(i, T, key):
            return _sample_loop(
                student, cfg, cond_for(student, i),
                jnp.full((1,), T, jnp.int32), t_max, key, 4, None)[:, :T]

        for name, fn in (("imf_2", imf_k(2)), ("imf_1", imf_k(1)),
                         ("under_dmd4", dmd4)):
            mel, sv = evaluate(fn)
            print(f"p={p:.2f} {name}: mel={mel:.3f} "
                  f"(excess {mel - floor:+.3f}) sv={sv:.3f}", flush=True)


if __name__ == "__main__":
    main()
