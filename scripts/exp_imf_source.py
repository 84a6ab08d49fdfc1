"""Corpus experiment: what closes the IMF few-step mel gap (VERDICT r3 #3)?

Round-3 measured IMF-2 mel excess 0.336 vs DMD-4's 0.039 — 8x off the
floor. Two hypotheses for why, each with a lever:

  1. TARGET ERROR — the integral target (x_t - x_r)/(t - r) inherits the
     teacher rollout's discretization error (substeps=4 over a ~0.5
     interval is teacher-8-step territory, which is not at floor).
     Lever: `sub12` raises rollout_substeps 4 -> 12.
  2. SOURCE CURVATURE — the teacher's flow is curved, so its average
     velocity varies strongly with x; the DMD-4 student's field was
     explicitly trained so 4 BIG steps land on the data manifold
     (straighter flow => easier integral). Lever: `dmd` distills the
     interval student FROM the DMD-4 student (init + rollout source),
     the second weapon VERDICT r3 names (the reference's own few-step
     generator, src/scripts/train/dmd2/distill.py).
  3. TRAINING-MASS MISMATCH — uniform (t, r) spends most gradient steps
     on intervals the 2-step sampler never evaluates. Lever: `focus`
     trains 50% of samples on the exact serving-grid intervals
     (ImfConfig.focus_prob).

Grid: baseline, each lever alone, and the combinations. Scores mel
(vs ground truth, codec floor printed) + SV cosine for IMF-2 / IMF-1,
plus dmd_student_4 as the anchor, on the tests/test_imf_quality.py
synthetic-corpus harness.

Usage: JAX_PLATFORMS=cpu python scripts/exp_imf_source.py [config ...]
  (configs: every CONFIGS key below, or `all`; --help prints the live list)
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

# EVERY config pins focus_prob EXPLICITLY: ImfConfig.focus_prob's default
# flipped to 0.5 mid-round (the wave-1/2 policy win), which silently turned
# any later config that omitted it into a focus stack. Waves 3-4 were run
# with that drift — the numbers are valid but the labels weren't: measured
# "rollin"/"rollin_long"/"dmdgrad" were focus0.5+lever stacks (relabeled
# in PERF.md), and "focus_dmdgrad" duplicated "dmdgrad". The *_pure
# configs below close the single-lever holes.
CONFIGS = {
    # name: (source, ImfConfig kwargs)
    "base": ("teacher", dict(rollout_substeps=4, focus_prob=0.0)),
    "sub12": ("teacher", dict(rollout_substeps=12, focus_prob=0.0)),
    "dmd": ("dmd", dict(rollout_substeps=4, focus_prob=0.0)),
    "dmd_sub12": ("dmd", dict(rollout_substeps=12, focus_prob=0.0)),
    "focus": ("teacher", dict(rollout_substeps=4, focus_prob=0.5)),
    # named for what it measures: dmd source + sub12 + focus (the old
    # "dmd_focus" label hid the substeps lever — advisor r4; PERF.md's
    # historical rows keep the old name with this mapping noted)
    "dmd_sub12_focus": ("dmd", dict(rollout_substeps=12, focus_prob=0.5)),
    # round-4 second wave (after the first grid measured focus=0.5 the
    # winner at IMF-2 excess 0.208 and refuted the dmd source):
    "focus1": ("teacher", dict(rollout_substeps=4, focus_prob=1.0)),
    "gan": ("teacher", dict(rollout_substeps=4, focus_prob=0.0,
                            gan_weight=1e-3)),
    "focus_gan": ("teacher",
                  dict(rollout_substeps=4, focus_prob=0.5, gan_weight=1e-3)),
    # round-4 wave 3: is the remaining gap training-BUDGET-limited or
    # method-limited? Same best config, 3x the steps (grid runs use 400).
    "focus_long": ("teacher", dict(rollout_substeps=4, focus_prob=0.5), 1200),
    # round-4 wave 4: backward-simulation roll-in — train the second
    # serving interval on the student's OWN first-step output (the state
    # the 2-step sampler actually feeds it; reference distill.py:248-287).
    # focus_rollin AS MEASURED was focus0.5+rollin0.5 (the default drift);
    # rollin_pure is the single lever.
    "rollin_pure": ("teacher", dict(rollout_substeps=4, focus_prob=0.0,
                                    rollin_prob=0.5)),
    "focus_rollin": ("teacher",
                     dict(rollout_substeps=4, focus_prob=0.5,
                          rollin_prob=0.5)),
    "focus_rollin25": ("teacher",
                       dict(rollout_substeps=4, focus_prob=0.5,
                            rollin_prob=0.25)),
    # round-4 wave 5a: does the ~0.2 plateau move when the BEST targeting
    # configs get the 3x budget?
    "focus1_long": ("teacher",
                    dict(rollout_substeps=4, focus_prob=1.0), 1200),
    "focus_rollin_long": ("teacher",
                          dict(rollout_substeps=4, focus_prob=0.5,
                               rollin_prob=0.5), 1200),
    # round-4 wave 5b: the untried weapon CLASS — distribution matching on
    # the served composition (the reference's core DMD gradient,
    # make_imf_dmd_steps). Targeting schemes plateaued at ~0.2; the
    # residual is the pure-noise first interval, which only a
    # distributional signal can sharpen (its input distribution is
    # already exactly right at train time).
    "dmdgrad_pure": ("teacher", dict(rollout_substeps=4, focus_prob=0.0,
                                     dmd_weight=1.0)),
    "focus_dmdgrad": ("teacher",
                      dict(rollout_substeps=4, focus_prob=0.5,
                           dmd_weight=1.0)),
}


def main():
    if sys.argv[1:2] in (["-h"], ["--help"]):
        print(__doc__.strip())
        print(f"\nconfigs: {' '.join(CONFIGS)} all")
        return
    names = sys.argv[1:] or ["all"]
    if names == ["all"]:
        names = list(CONFIGS)
    unknown = [n for n in names if n not in CONFIGS]
    if unknown:
        raise SystemExit(f"unknown configs {unknown}; choose from {list(CONFIGS)}")

    from test_imf_quality import (  # noqa: E402
        _build_corpus_and_models,
        _sv_embed_fn,
        _train_dmd2,
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

    dmd_student = None
    if any(CONFIGS[n][0] == "dmd" for n in names):
        dmd_student = _train_dmd2(teacher, batch, cfg)

        def dmd4_anchor(i, T, key):
            return _sample_loop(
                dmd_student, cfg, cond_for(dmd_student, i),
                jnp.full((1,), T, jnp.int32), t_max, key, 4, None)[:, :T]

        mel, sv = evaluate(dmd4_anchor)
        print(f"anchor dmd_student_4: mel={mel:.3f} "
              f"(excess {mel - floor:+.3f}) sv={sv:.3f}", flush=True)

    for name in names:
        source_name, kwargs, *rest = CONFIGS[name]
        steps = rest[0] if rest else 400
        source = teacher if source_name == "teacher" else dmd_student
        student = _train_imf(source, batch, cfg, steps=steps,
                             imf_cfg=ImfConfig(**kwargs))

        def imf_k(k):
            return lambda i, T, key: imf_sample(
                student, cfg, cond_for(student, i),
                jnp.full((1,), T, jnp.int32), t_max, key, num_steps=k)[:, :T]

        for sname, fn in (("imf_2", imf_k(2)), ("imf_1", imf_k(1))):
            mel, sv = evaluate(fn)
            print(f"{name} {sname}: mel={mel:.3f} "
                  f"(excess {mel - floor:+.3f}) sv={sv:.3f}", flush=True)


if __name__ == "__main__":
    main()
