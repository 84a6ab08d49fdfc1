"""End-to-end toolchain chain: every stage consumes the previous stage's
ON-DISK checkpoint, exactly as a user would run the CLIs in sequence:

    train_teacher -> train_asr -> train_sv -> train_distill (DMD2)
      -> train_imf -> SmallTTS(checkpoint=...) -> waveform

The per-driver tests prove each loop in isolation (with params_override);
this proves the npz checkpoint contract BETWEEN them — file names, pytree
layouts, and SmallTTS's sampler auto-detection — so no stage can drift
without failing here. RUN_SLOW: compiles ~6 tiny graphs (~3 min CPU).
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1",
    reason="multi-stage chain, several minutes; RUN_SLOW=1",
)


def _tiny_data(seed=0):
    from smalltts_tpu.data.dummy import DummyDataConfig, dummy_batch

    cfgd = DummyDataConfig(batch_size=2, max_phonemes=10, min_phonemes=4,
                           max_latents=16, min_latents=8, max_ref=8, min_ref=4)
    rng = np.random.default_rng(seed)
    while True:
        yield dummy_batch(rng, cfgd)


def test_full_toolchain_checkpoint_chain(tmp_path):
    from test_distill import TINY_ASR64, TINY_DISC, TINY_SV64
    from tiny import TINY_BACKBONE, TINY_CODEC

    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.codec import init_codec
    from smalltts_tpu.train.asr_train import ASRTrainConfig, train_asr
    from smalltts_tpu.train.distill import DistillConfig, train_distill
    from smalltts_tpu.train.imf import ImfConfig, train_imf
    from smalltts_tpu.train.sv_train import SVTrainConfig, train_sv
    from smalltts_tpu.train.teacher import TeacherTrainConfig, train_teacher

    d = {k: str(tmp_path / k)
         for k in ("teacher", "asr", "sv", "dmd", "imf", "imf_dmd")}

    # 1) flow-matching teacher
    train_teacher(
        TeacherTrainConfig(num_steps=3, save_every=2, batch_size=2),
        model_cfg=TINY_BACKBONE, data_iter=_tiny_data(0),
        checkpoint_dir=d["teacher"], log_every=1,
    )
    teacher_ema = os.path.join(d["teacher"], "checkpoint_ema.npz")
    assert os.path.exists(teacher_ema)

    # 2) CTC aligner + 3) latent SV (the DMD2 loss teachers)
    train_asr(ASRTrainConfig(num_steps=3, save_every=2, batch_size=2),
              model_cfg=TINY_ASR64, data_iter=_tiny_data(1),
              checkpoint_dir=d["asr"], log_every=1)
    train_sv(SVTrainConfig(num_steps=3, save_every=2, batch_size=2),
             model_cfg=TINY_SV64, codec_cfg=TINY_CODEC,
             codec_params=init_codec(jax.random.PRNGKey(9), TINY_CODEC),
             data_iter=_tiny_data(2), checkpoint_dir=d["sv"], log_every=1)

    # 4) DMD2 distillation, all three inputs loaded from the files above
    _, _, _, metrics = train_distill(
        DistillConfig(num_steps=3, scorer_updates=1, save_every=2,
                      asr_start_step=0, sv_start_step=0),
        model_cfg=TINY_BACKBONE, disc_cfg=TINY_DISC, asr_cfg=TINY_ASR64,
        sv_cfg=TINY_SV64,
        teacher_checkpoint=teacher_ema,
        asr_checkpoint=os.path.join(d["asr"], "checkpoint_latest.npz"),
        sv_checkpoint=os.path.join(d["sv"], "checkpoint_latest.npz"),
        checkpoint_dir=d["dmd"], data_iter=_tiny_data(3),
    )
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    student_path = os.path.join(d["dmd"], "student_latest.npz")
    assert os.path.exists(student_path)

    # 5) IMF few-step distillation FROM the DMD student — through the
    # ADVERSARIAL driver branch (gan_weight > 0 builds + alternates the
    # discriminator and writes its sidecar checkpoint)
    train_imf(ImfConfig(num_steps=3, save_every=2, rollout_substeps=2,
                        gan_weight=1e-3),
              model_cfg=TINY_BACKBONE, teacher_checkpoint=student_path,
              checkpoint_dir=d["imf"], data_iter=_tiny_data(4), log_every=1)
    imf_path = os.path.join(d["imf"], "imf_student_latest.npz")
    assert os.path.exists(imf_path)
    assert os.path.exists(
        os.path.join(d["imf"], "imf_discriminator_latest.npz"))

    # 5b) the DMD-gradient driver branch (dmd_weight > 0 builds + alternates
    # the fake-score model and writes its sidecar checkpoint)
    train_imf(ImfConfig(num_steps=3, save_every=2, rollout_substeps=2,
                        dmd_weight=1.0, dmd_scorer_updates=1),
              model_cfg=TINY_BACKBONE, teacher_checkpoint=student_path,
              checkpoint_dir=d["imf_dmd"], data_iter=_tiny_data(5),
              log_every=1)
    assert os.path.exists(
        os.path.join(d["imf_dmd"], "imf_student_latest.npz"))
    assert os.path.exists(
        os.path.join(d["imf_dmd"], "imf_scorer_latest.npz"))
    with pytest.raises(ValueError):  # the two drivers are exclusive
        train_imf(ImfConfig(gan_weight=1e-3, dmd_weight=1.0),
                  model_cfg=TINY_BACKBONE, teacher_checkpoint=student_path,
                  checkpoint_dir=d["imf_dmd"], data_iter=_tiny_data(6))

    # 6) serve each checkpoint through the public pipeline
    ref = np.random.RandomState(0).randn(6, 64).astype(np.float32)
    tts_dmd = SmallTTS(checkpoint=student_path, cfg=TINY_BACKBONE,
                       codec_cfg=TINY_CODEC)
    assert tts_dmd.sampler == "dmd" and tts_dmd.num_steps == 4
    audio = tts_dmd.synthesize(ref, [1, 2, 3], 1.0)
    assert audio.shape == (1, 8 * 3200) and np.isfinite(audio).all()

    # an IMF checkpoint auto-selects its best-measured recurrence, IMF-2
    # (quality gate, test_imf_quality: beats IMF-1 and DMD-4-on-same-weights)
    tts_imf = SmallTTS(checkpoint=imf_path, cfg=TINY_BACKBONE,
                       codec_cfg=TINY_CODEC)
    assert tts_imf.sampler == "imf" and tts_imf.num_steps == 2
    audio = tts_imf.synthesize(ref, [1, 2, 3], 1.0)
    assert audio.shape == (1, 8 * 3200) and np.isfinite(audio).all()
