"""Checkpoint-embedded config metadata (round-4 UX closure).

A checkpoint that doesn't know its own architecture loads as shape errors
(the reference ships test_checkpoint.py:44-73 just to debug that). Our
trainers embed the config dict in the npz under a reserved key; SmallTTS
reconstructs the exact architecture when no explicit cfg is passed. These
tests pin: the meta round-trip, load_pytree's indifference to the reserved
key (old/new format interop), config reconstruction incl. tuple coercion
and forward-compat key dropping, and the no-ceremony SmallTTS load of a
tiny checkpoint end-to-end.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smalltts_tpu.utils import checkpoint as ckpt
from smalltts_tpu.utils.config_io import (
    backbone_config_from_dict,
    backbone_config_from_meta,
    backbone_meta,
    codec_config_from_dict,
    codec_meta,
    config_to_dict,
)
from tests.tiny import TINY_BACKBONE, TINY_CODEC


def test_meta_roundtrip_and_load_pytree_ignores_it(tmp_path):
    tree = {"a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "b": np.asarray([1, 2], np.int32)}
    path = str(tmp_path / "with_meta.npz")
    ckpt.save_pytree(path, tree, meta={"backbone_config": {"hidden_dim": 8},
                                       "note": "x"})
    meta = ckpt.load_meta(path)
    assert meta["backbone_config"] == {"hidden_dim": 8}
    assert meta["note"] == "x"
    loaded = ckpt.load_pytree(path)  # reserved key must NOT leak into the tree
    assert set(loaded) == {"a", "b"}
    np.testing.assert_array_equal(loaded["a"]["w"], tree["a"]["w"])


def test_old_format_checkpoints_have_no_meta(tmp_path):
    path = str(tmp_path / "plain.npz")
    ckpt.save_pytree(path, {"w": np.zeros(3, np.float32)})
    assert ckpt.load_meta(path) is None


def test_backbone_config_roundtrip():
    d = config_to_dict(TINY_BACKBONE)
    # simulate the JSON wire: tuples -> lists
    import json

    d = json.loads(json.dumps(d))
    cfg = backbone_config_from_dict(d)
    assert cfg == TINY_BACKBONE


def test_codec_config_roundtrip_coerces_tuples():
    import json

    d = json.loads(json.dumps(config_to_dict(TINY_CODEC)))
    cfg = codec_config_from_dict(d)
    assert cfg == TINY_CODEC
    assert isinstance(cfg.strides, tuple)


def test_forward_compat_unknown_keys_dropped():
    d = config_to_dict(TINY_BACKBONE)
    d["a_future_field"] = 123
    d["dit"]["another_future_field"] = "x"
    cfg = backbone_config_from_dict(d)
    assert cfg == TINY_BACKBONE


def test_meta_helpers():
    assert backbone_config_from_meta(None) is None
    assert backbone_config_from_meta({"codec_config": {}}) is None
    meta = backbone_meta(TINY_BACKBONE)
    assert backbone_config_from_meta(meta) == TINY_BACKBONE


def test_smalltts_autoconfig_from_checkpoint(tmp_path):
    """The user journey: train tiny -> SmallTTS(checkpoint=...) with NO cfg
    argument -> synthesize. Without embedded config this dies in shape
    mismatches against the 328M default."""
    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec

    bp = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    cp = init_codec(jax.random.PRNGKey(1), TINY_CODEC)
    b_path = str(tmp_path / "backbone.npz")
    c_path = str(tmp_path / "codec.npz")
    ckpt.save_pytree(b_path, bp, meta=backbone_meta(TINY_BACKBONE))
    ckpt.save_pytree(c_path, cp, meta=codec_meta(TINY_CODEC))

    tts = SmallTTS(checkpoint=b_path, codec_checkpoint=c_path, codec="native")
    assert tts.cfg == TINY_BACKBONE
    assert tts.codec_cfg == TINY_CODEC
    ref = np.random.RandomState(0).randn(6, 64).astype(np.float32)
    audio = tts.synthesize(ref, [1, 2, 3], 1.0)
    assert audio.shape[0] == 1 and np.isfinite(np.asarray(audio, np.float32)).all()

    # explicit cfg still wins over the embedded one
    alt = dataclasses.replace(TINY_BACKBONE)
    tts2 = SmallTTS(checkpoint=b_path, codec_checkpoint=c_path,
                    codec="native", cfg=alt, codec_cfg=TINY_CODEC)
    assert tts2.cfg is alt


def test_trainers_embed_config(tmp_path):
    """Every backbone-family trainer's checkpoint must carry its config."""
    from smalltts_tpu.data.dummy import DummyDataConfig, dummy_batch
    from smalltts_tpu.train.imf import ImfConfig, train_imf
    from smalltts_tpu.train.teacher import TeacherTrainConfig, train_teacher

    def data_iter(seed=0):
        cfgd = DummyDataConfig(batch_size=2, max_phonemes=10, min_phonemes=4,
                               max_latents=16, min_latents=8, max_ref=8,
                               min_ref=4)
        rng = np.random.default_rng(seed)
        while True:
            yield dummy_batch(rng, cfgd)

    data = data_iter()
    d = str(tmp_path / "teacher")
    train_teacher(TeacherTrainConfig(num_steps=3, save_every=2, batch_size=2),
                  model_cfg=TINY_BACKBONE, data_iter=data,
                  checkpoint_dir=d, log_every=1)
    for name in ("checkpoint_latest.npz", "checkpoint_ema.npz"):
        cfg = backbone_config_from_meta(ckpt.load_meta(f"{d}/{name}"))
        assert cfg == TINY_BACKBONE, name

    d2 = str(tmp_path / "imf")
    train_imf(ImfConfig(num_steps=3, save_every=2, rollout_substeps=2),
              model_cfg=TINY_BACKBONE,
              teacher_checkpoint=f"{d}/checkpoint_ema.npz",
              checkpoint_dir=d2, data_iter=data, log_every=1)
    cfg = backbone_config_from_meta(
        ckpt.load_meta(f"{d2}/imf_student_latest.npz"))
    assert cfg == TINY_BACKBONE
