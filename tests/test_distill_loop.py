"""Full distillation driver loop (3 steps, tiny configs): exercises
train_distill end-to-end including the checkpoint plumbing."""

import numpy as np
import pytest

import jax

from tiny import TINY_BACKBONE
from test_distill import TINY_ASR64, TINY_DISC, TINY_SV64, _randomize_velocity_head
from smalltts_tpu.data.dummy import DummyDataConfig, dummy_batch
from smalltts_tpu.models.asr import init_asr
from smalltts_tpu.models.backbone import init_backbone
from smalltts_tpu.models.discriminator import init_discriminator
from smalltts_tpu.models.sv import init_sv
from smalltts_tpu.train.distill import DistillConfig, train_distill


@pytest.mark.skipif(
    __import__("os").environ.get("RUN_SLOW") != "1",
    reason="3-graph compile, ~3 min; covered by test_distill.py math checks",
)
def test_train_distill_driver(tmp_path):
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    teacher = _randomize_velocity_head(init_backbone(ks[0], TINY_BACKBONE), ks[5])

    def data():
        cfgd = DummyDataConfig(batch_size=2, max_phonemes=10, min_phonemes=4,
                               max_latents=16, min_latents=8, max_ref=8, min_ref=4)
        rng = np.random.default_rng(0)
        while True:
            yield dummy_batch(rng, cfgd)

    student, scorer, disc, metrics = train_distill(
        DistillConfig(num_steps=3, scorer_updates=2, save_every=2,
                      asr_start_step=0, sv_start_step=0),
        model_cfg=TINY_BACKBONE,
        disc_cfg=TINY_DISC,
        asr_cfg=TINY_ASR64,
        sv_cfg=TINY_SV64,
        checkpoint_dir=str(tmp_path),
        data_iter=data(),
        params_override={
            "teacher": teacher,
            "asr": init_asr(ks[1], TINY_ASR64),
            "sv": init_sv(ks[2], TINY_SV64),
            "disc": init_discriminator(ks[3], TINY_DISC),
        },
    )
    for name, v in metrics.items():
        assert np.isfinite(v), name
    assert (tmp_path / "student_latest.npz").exists()
    assert (tmp_path / "scorer_latest.npz").exists()
    assert (tmp_path / "discriminator_latest.npz").exists()
