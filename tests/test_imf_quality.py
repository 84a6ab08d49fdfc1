"""IMF few-step quality gate on the multi-utterance synthetic corpus.

Round-2 VERDICT Missing #4 / weak #2: the 270x IMF-1 serving headline and
the `sampler="auto"` promotion rested on mechanism tests only. This closes
the loop at corpus level, fully in-repo: train codec -> teacher -> DMD2
student -> IMF student on a 2-speaker x 3-text synthetic corpus, then
compare mel-distance and SV-similarity (random-feature waveform ECAPA —
proven to separate these speakers in test_synthetic.py) of:

    teacher 32-step      (quality anchor)
    teacher 4-step       (what the serving recurrence does UNdistilled)
    DMD2 student 4-step  (the reference-parity serving path)
    IMF student 2-step / 1-step

OUTCOME (the runs that set the policy): DMD-4 reaches the codec's own mel
floor (excess 0.039) while IMF-2/IMF-1 measure 0.336/0.546 — few-step is
NOT mel-parity on this corpus, though it slightly beats DMD on SV
similarity (0.968 vs 0.939). A second measurement (after the r_gate
embedding fix) scored the IMF checkpoint served through the gated DMD-4
recurrence: mel 7.912 (excess 1.281), the WORST path on that checkpoint —
interval training trades away instantaneous-velocity accuracy, so the
4-step loop should never be used on an IMF student. Together these set
`sampler="auto"` = best-measured recurrence per checkpoint class: plain
-> DMD-4, r_gate -> IMF-2 (infer/pipeline.py;
test_imf.py::test_smalltts_sampler_policy pins the wiring). The
assertions below pin the measured relationships; the final one FAILS
LOUDLY if IMF ever reaches DMD-4 mel parity, prompting a policy revisit.

Reference anchor: the 4-step loop IMF must match,
src/smalltts/infer/onnx.py:102-125; the reference never went below 4 steps.
RUN_SLOW: ~20 min CPU (codec 300 + teacher 800 + DMD2 150 + IMF 400 steps).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1",
    reason="multi-stage corpus training (~20 min); RUN_SLOW=1",
)

SR = 24_000
TEXTS = ["blue moon light", "red sun down fall", "green leaf wind song"]
SPEAKERS = (0, 1)
REF_FRAMES = 8


def _tokens(text):
    return np.asarray([max(1, ord(c) % 150) for c in text], np.int32)


def _build_corpus_and_models():
    import optax

    from smalltts_tpu.data.synthetic import synth_speech
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import codec_decode, codec_encode, init_codec
    from smalltts_tpu.train.codec_train import CodecTrainConfig, make_codec_step
    from smalltts_tpu.train.ema import ema_init
    from smalltts_tpu.train.optim import adamw
    from smalltts_tpu.train.teacher import make_teacher_step
    from tiny import TINY_BACKBONE, TINY_CODEC

    hop = TINY_CODEC.hop
    utts = []
    for s in SPEAKERS:
        for text in TEXTS:
            wav = synth_speech(text, speaker=s, seed=0)
            wav = wav[: (len(wav) // hop) * hop]
            utts.append({"wav": wav, "text": text, "speaker": s,
                         "tokens": _tokens(text)})

    # ---- codec: train on fixed-length slices of every utterance
    slice_len = min(len(u["wav"]) for u in utts)
    slice_len = (slice_len // hop) * hop
    aud = jnp.asarray(np.stack([u["wav"][:slice_len] for u in utts])[:, None])
    cp = init_codec(jax.random.PRNGKey(0), TINY_CODEC)
    tx_c = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
    oc = tx_c.init(cp)
    step_c = make_codec_step(TINY_CODEC, CodecTrainConfig(lr=3e-4), tx_c)
    for _ in range(300):
        cp, oc, loss, _ = step_c(cp, oc, aud)
        assert np.isfinite(float(loss))

    for u in utts:
        lat = np.asarray(codec_encode(
            cp, jnp.asarray(u["wav"][None, None]), TINY_CODEC))[0]
        u["latents"] = lat
        rec = np.asarray(codec_decode(
            cp, jnp.asarray(lat[None]), TINY_CODEC))[0, 0]
        u["rec_floor"] = rec

    # ---- one fixed padded batch holding the WHOLE corpus
    t_max = max(u["latents"].shape[0] for u in utts)
    p_max = max(len(u["tokens"]) for u in utts)
    b = len(utts)
    batch = {
        "latents": np.zeros((b, t_max, 64), np.float32),
        "latents_lengths": np.zeros((b,), np.int32),
        "ref_latents": np.zeros((b, REF_FRAMES, 64), np.float32),
        "ref_latents_lengths": np.full((b,), REF_FRAMES, np.int32),
        "phonemes": np.zeros((b, p_max), np.int32),
        "phonemes_lengths": np.zeros((b,), np.int32),
    }
    for i, u in enumerate(utts):
        T = u["latents"].shape[0]
        batch["latents"][i, :T] = u["latents"]
        batch["latents_lengths"][i] = T
        batch["ref_latents"][i] = u["latents"][:REF_FRAMES]
        batch["phonemes"][i, : len(u["tokens"])] = u["tokens"]
        batch["phonemes_lengths"][i] = len(u["tokens"])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # ---- teacher
    params = init_backbone(jax.random.PRNGKey(1), TINY_BACKBONE)
    tx = adamw(params, 2e-3, clip_norm=1.0)
    o = tx.init(params)
    ema = ema_init(params)
    st = make_teacher_step(TINY_BACKBONE, tx)
    key = jax.random.PRNGKey(2)
    for _ in range(800):
        key, sub = jax.random.split(key)
        params, o, ema, loss = st(params, o, ema, batch, sub)
        assert np.isfinite(float(loss))

    return utts, cp, batch, params, TINY_BACKBONE, TINY_CODEC


def _train_dmd2(teacher, batch, cfg, steps=150):
    """Short DMD2 run: aux losses (CTC/SV/GAN) are the reference's
    real-data refinements (enabled after 5k/7k steps there); at corpus
    scale they are noise from untrained aux models, so this isolates the
    distribution-matching core + scorer."""
    import optax

    from smalltts_tpu.models.asr import init_asr
    from smalltts_tpu.models.discriminator import init_discriminator
    from smalltts_tpu.models.sv import init_sv
    from smalltts_tpu.train.distill import (
        DistillConfig,
        make_scorer_step,
        make_student_step,
    )
    from test_distill import TINY_ASR64, TINY_DISC, TINY_SV64

    dc = DistillConfig(asr_start_step=10**9, sv_start_step=10**9,
                       gan_weight=0.0, scorer_updates=2)
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    student = jax.tree.map(jnp.copy, teacher)
    scorer = jax.tree.map(jnp.copy, teacher)
    asr = init_asr(ks[0], TINY_ASR64)
    sv = init_sv(ks[1], TINY_SV64)
    disc = init_discriminator(ks[2], TINY_DISC)
    tx_s = optax.adamw(5e-5)
    tx_sc = optax.adamw(5e-5)
    s_opt = tx_s.init(student)
    sc_opt = tx_sc.init(scorer)
    student_step = make_student_step(cfg, TINY_DISC, TINY_ASR64, TINY_SV64,
                                     tx_s, dc)
    scorer_step = make_scorer_step(cfg, tx_sc, dc.scorer_updates)
    key = ks[3]
    for i in range(steps):
        key, k1, k2 = jax.random.split(key, 3)
        student, s_opt, carry, metrics = student_step(
            student, s_opt, teacher, scorer, disc, asr, sv, batch,
            jnp.asarray(i), k1)
        scorer, sc_opt, sc_loss = scorer_step(scorer, sc_opt, student, batch,
                                              carry, k2)
        assert np.isfinite(float(metrics["st_pseudo"])), i
        assert np.isfinite(float(sc_loss)), i
    return student


def _train_imf(teacher, batch, cfg, steps=400, imf_cfg=None):
    import optax

    from smalltts_tpu.train.imf import (
        ImfConfig,
        init_imf_student,
        make_imf_adv_steps,
        make_imf_dmd_steps,
        make_imf_step,
    )

    imf_cfg = imf_cfg or ImfConfig(rollout_substeps=4)
    student = init_imf_student(teacher)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
    opt = tx.init(student)
    key = jax.random.PRNGKey(4)
    if imf_cfg.dmd_weight > 0.0:
        scorer = jax.tree.map(jnp.copy, teacher)
        tx_sc = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
        opt_sc = tx_sc.init(scorer)
        sstep, scstep = make_imf_dmd_steps(cfg, tx, tx_sc, imf_cfg)
        for _ in range(steps):
            key, k1, k2 = jax.random.split(key, 3)
            student, opt, carry, m = sstep(student, opt, teacher, scorer,
                                           batch, k1)
            scorer, opt_sc, sc_loss = scstep(scorer, opt_sc, batch, carry, k2)
            assert np.isfinite(float(m["imf_loss"]))
            assert np.isfinite(float(m["dmd_loss"]))
            assert np.isfinite(float(sc_loss))
        return student
    if imf_cfg.gan_weight > 0.0:
        from smalltts_tpu.models.discriminator import init_discriminator
        from test_distill import TINY_DISC

        disc = init_discriminator(jax.random.PRNGKey(5), TINY_DISC)
        tx_d = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
        opt_d = tx_d.init(disc)
        sstep, dstep = make_imf_adv_steps(cfg, TINY_DISC, tx, tx_d, imf_cfg)
        for _ in range(steps):
            key, k1, k2 = jax.random.split(key, 3)
            student, opt, carry, m = sstep(student, opt, teacher, disc,
                                           batch, k1)
            disc, opt_d, d_loss = dstep(disc, opt_d, teacher, batch, carry, k2)
            assert np.isfinite(float(m["imf_loss"]))
            assert np.isfinite(float(d_loss))
        return student
    step = make_imf_step(cfg, tx, imf_cfg)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        student, opt, loss = step(student, opt, teacher, batch, sub)
        assert np.isfinite(float(loss))
    return student


def _sv_embed_fn():
    """Random-feature waveform ECAPA: separates the synthetic speakers
    (test_synthetic.py::test_sv_teacher_separates_synthetic_speakers)."""
    from smalltts_tpu.models.sv import SVConfig
    from smalltts_tpu.models.sv_teacher import (
        init_sv_teacher,
        resample_24k_to_16k,
        sv_teacher_embed,
    )

    cfg = SVConfig(input_dim=80, channels=(16, 16, 16, 16, 48), emb_dim=8,
                   attention_channels=8, se_channels=8, res2net_scale=2)
    sv_params = init_sv_teacher(jax.random.PRNGKey(7), cfg)

    def embed(wav):
        a16 = resample_24k_to_16k(np.asarray(wav, np.float32)[None, None, :])
        e = np.asarray(sv_teacher_embed(sv_params, a16, cfg=cfg))[0]
        return e / (np.linalg.norm(e) + 1e-9)

    return embed


def test_imf_vs_dmd_quality_on_corpus():
    from smalltts_tpu.infer.sampler import _sample_loop
    from smalltts_tpu.infer.teacher_sampler import make_teacher_sampler
    from smalltts_tpu.models.backbone import encode_conditions
    from smalltts_tpu.models.codec import codec_decode
    from smalltts_tpu.ops.masking import length_mask
    from smalltts_tpu.train.imf import imf_sample
    from smalltts_tpu.utils.metrics import mel_distance

    utts, cp, batch, teacher, cfg, codec_cfg = _build_corpus_and_models()
    dmd_student = _train_dmd2(teacher, batch, cfg)
    imf_student = _train_imf(teacher, batch, cfg)
    embed = _sv_embed_fn()
    sampler32 = make_teacher_sampler(cfg, num_steps=32,
                                     cfg_scale_text=1.0, cfg_scale_speaker=1.0)

    def evaluate(name, sample_fn):
        """sample_fn(cond, seq_len, T, key) -> latents (1, T, 64)."""
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

    def cond_for(params, i):
        return encode_conditions(
            params, cfg,
            batch["ref_latents"][i : i + 1], batch["ref_latents_lengths"][i : i + 1],
            batch["phonemes"][i : i + 1],
            length_mask(batch["phonemes_lengths"][i : i + 1],
                        batch["phonemes"].shape[1]),
        )

    def teacher32(i, T, key):
        return sampler32(
            teacher, batch["ref_latents"][i : i + 1],
            batch["ref_latents_lengths"][i : i + 1],
            batch["phonemes"][i : i + 1], batch["phonemes_lengths"][i : i + 1],
            jnp.full((1,), T, jnp.int32), key, int(batch["latents"].shape[1]),
        )[:, :T]

    def dmd4(params):
        def fn(i, T, key):
            lat = _sample_loop(params, cfg, cond_for(params, i),
                               jnp.full((1,), T, jnp.int32),
                               int(batch["latents"].shape[1]), key, 4, None)
            return lat[:, :T]
        return fn

    def imf_k(k):
        def fn(i, T, key):
            lat = imf_sample(imf_student, cfg, cond_for(imf_student, i),
                             jnp.full((1,), T, jnp.int32),
                             int(batch["latents"].shape[1]), key, num_steps=k)
            return lat[:, :T]
        return fn

    results = {
        "teacher_32": evaluate("teacher_32", teacher32),
        "teacher_4": evaluate("teacher_4", dmd4(teacher)),
        "dmd_student_4": evaluate("dmd_student_4", dmd4(dmd_student)),
        # the IMF checkpoint under the DMD-4 recurrence, with the
        # (1 + r_gate) embedding gate (_sample_loop applies it because the
        # params carry r_gate — review r3 fix). Measured WORST of the
        # paths on this checkpoint, which is why auto resolves r_gate
        # checkpoints to IMF-2 instead.
        "imf_under_dmd4": evaluate("imf_under_dmd4", dmd4(imf_student)),
        "imf_2": evaluate("imf_2", imf_k(2)),
        "imf_1": evaluate("imf_1", imf_k(1)),
    }
    floor = float(np.mean([mel_distance(u["wav"][: len(u["rec_floor"])],
                                        u["rec_floor"]) for u in utts]))
    print(f"\ncodec floor mel={floor:.3f}")
    for name, (mel, sv) in results.items():
        print(f"{name}: mel={mel:.3f} sv={sv:.3f}")

    mel_dmd, sv_dmd = results["dmd_student_4"]
    mel_imf2, sv_imf2 = results["imf_2"]
    mel_imf1, sv_imf1 = results["imf_1"]
    mel_t32, _ = results["teacher_32"]
    mel_imf_dmd4, _ = results["imf_under_dmd4"]
    excess = lambda m: m - floor  # noqa: E731

    # Measured on this fixture (2026-08, the runs that set the sampler
    # policy): floor 6.63; excess — teacher_32 0.042, dmd_student_4 0.039
    # (both AT the codec floor), imf_2 0.336, imf_1 0.546, imf_under_dmd4
    # 1.281 (worst path on the IMF checkpoint); SV — dmd 0.939, imf_2
    # 0.968, imf_1 0.968, imf_under_dmd4 0.979.

    # teacher + DMD-4 serving path reach the codec floor
    assert excess(mel_t32) < 0.2, results
    assert excess(mel_dmd) < 0.2, results
    # IMF trains: far below untrained scale (~1+ excess), 2-step >= 1-step,
    # speaker similarity at least DMD's. With the round-4 default
    # focus_prob=0.5 the SERVED path tightens (IMF-2 excess measured
    # 0.208, was 0.336) while IMF-1 — which auto never serves — trades
    # away to ~1.12 (PERF.md round-4 grid); the bounds reflect that split.
    assert excess(mel_imf2) < 0.5, results
    assert excess(mel_imf1) < 1.5, results
    assert mel_imf2 <= mel_imf1 + 0.1, results
    assert sv_imf2 > sv_dmd - 0.05, results
    assert sv_imf1 > sv_dmd - 0.15, results

    # THE AUTO-POLICY EVIDENCE FOR IMF CHECKPOINTS: on the same weights,
    # IMF-2 beats both IMF-1 and the gated DMD-4 recurrence (measured
    # 6.968 vs 7.178 vs 7.912) — the basis for auto resolving r_gate
    # checkpoints to IMF-2, never to the 4-step loop.
    assert mel_imf2 < mel_imf_dmd4 - 0.1, results
    assert excess(mel_imf_dmd4) < 2.0, results  # still far below untrained

    # THE POLICY EVIDENCE: IMF few-step does NOT reach DMD-4 mel parity on
    # this corpus — the basis for sampler="auto" resolving to "dmd"
    # (infer/pipeline.py). If IMF training improves enough to flip this
    # assertion, revisit that policy with the new numbers.
    assert excess(mel_imf2) > 1.5 * excess(mel_dmd), (
        "IMF-2 now within 1.5x of DMD-4 excess-mel — re-evaluate the "
        f"auto-sampler demotion: {results}")
