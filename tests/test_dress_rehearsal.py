"""End-to-end real-corpus dress rehearsal (VERDICT r4 #6).

The exact sequence first contact with real data will run, in one test:

    wav+txt files on disk
      -> scan_corpus / LocalDataset (data/local.py)
      -> REAL codec encode on device (models/codec.codec_encode)
      -> teacher training (train/teacher.py), checkpoint WITH config meta
      -> checkpoint round-trip (utils/checkpoint.load_pytree / load_meta)
      -> DMD2 distillation (train/distill.py) from the loaded teacher
      -> SmallTTS autoconfigured FROM the distilled checkpoint's meta
      -> HTTP serving path (serving/server.py) synthesizes from a corpus
         wav as the cloning reference

The reference cannot run this sequence at all: its only loader emits
random tensors (reference: src/smalltts/data/dummy.py, README.md:130 —
"bring your own data"), so the bring-up path this rehearses is exactly
what its users have to write themselves.

Quality is NOT asserted here (budgets are a handful of steps); the chain,
the shape/key contracts, and the checkpoint metadata round-trip are.
RUN_SLOW: ~5 min of tiny-model compiles on CPU.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1",
    reason="full corpus->train->distill->serve chain (minutes); RUN_SLOW=1",
)


def test_corpus_to_serving_rehearsal(tmp_path):
    from tiny import TINY_BACKBONE, TINY_CODEC
    from test_distill import TINY_ASR64, TINY_DISC, TINY_SV64

    from smalltts_tpu.data.local import LocalDataConfig, get_local_dataloader
    from smalltts_tpu.data.synthetic import write_corpus
    from smalltts_tpu.models.asr import init_asr
    from smalltts_tpu.models.codec import codec_encode, init_codec
    from smalltts_tpu.models.discriminator import init_discriminator
    from smalltts_tpu.models.sv import init_sv
    from smalltts_tpu.train.distill import DistillConfig, train_distill
    from smalltts_tpu.train.teacher import TeacherTrainConfig, train_teacher
    from smalltts_tpu.utils import checkpoint as ckpt
    from smalltts_tpu.utils.config_io import codec_meta

    # ---- 1. a corpus of wav files with transcripts on disk
    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, n_utts=6, n_speakers=2)

    # ---- 2. real codec encode feeding the loader (device-batched)
    codec_params = init_codec(jax.random.PRNGKey(1), TINY_CODEC)
    enc = jax.jit(lambda a: codec_encode(codec_params, a, TINY_CODEC))

    def encode_fn(audio):
        return np.asarray(enc(jnp.asarray(audio)))

    dcfg = LocalDataConfig(batch_size=2, latent_dim=TINY_CODEC.latent_dim,
                           max_phonemes=48, max_latents=24, max_ref=8,
                           min_latents=2, hop=TINY_CODEC.hop)

    # ---- 3. teacher training on the corpus; checkpoint carries meta
    teacher_dir = str(tmp_path / "teacher")
    train_teacher(
        TeacherTrainConfig(num_steps=3, batch_size=2, save_every=2),
        model_cfg=TINY_BACKBONE,
        data_iter=get_local_dataloader(corpus, encode_fn, dcfg),
        checkpoint_dir=teacher_dir,
    )
    ema_path = os.path.join(teacher_dir, "checkpoint_ema.npz")
    assert os.path.exists(ema_path), "teacher run wrote no EMA checkpoint"
    meta = ckpt.load_meta(ema_path)
    assert meta and (meta["backbone_config"]["hidden_dim"]
                     == TINY_BACKBONE.hidden_dim)

    # ---- 4. distillation from the LOADED teacher checkpoint
    teacher = ckpt.load_pytree(ema_path)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    dmd_dir = str(tmp_path / "dmd")
    student, scorer, disc, metrics = train_distill(
        DistillConfig(num_steps=3, batch_size=2, save_every=2,
                      scorer_updates=1, asr_start_step=0, sv_start_step=0),
        model_cfg=TINY_BACKBONE, disc_cfg=TINY_DISC,
        asr_cfg=TINY_ASR64, sv_cfg=TINY_SV64,
        params_override={
            "teacher": teacher,
            "asr": init_asr(ks[0], TINY_ASR64),
            "sv": init_sv(ks[1], TINY_SV64),
            "disc": init_discriminator(ks[2], TINY_DISC),
        },
        data_iter=get_local_dataloader(corpus, encode_fn, dcfg, seed=3),
        checkpoint_dir=dmd_dir,
    )
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    student_path = os.path.join(dmd_dir, "student_latest.npz")
    assert os.path.exists(student_path), "distill run wrote no student"

    # ---- 5. serving from checkpoints alone: architecture reconstructed
    # from the embedded meta (no cfg passed anywhere below)
    codec_path = str(tmp_path / "codec.npz")
    ckpt.save_pytree(codec_path, codec_params, meta=codec_meta(TINY_CODEC))

    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.serving.multipart import build_multipart
    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config

    tts = SmallTTS(checkpoint=student_path, codec_checkpoint=codec_path,
                   codec="native")
    assert tts.cfg.hidden_dim == TINY_BACKBONE.hidden_dim

    server = TTSServer(tts=tts, x402_cfg=X402Config(mode="disabled"))
    ref_wav = open(os.path.join(corpus, "0000.wav"), "rb").read()
    body, ctype = build_multipart(
        {"audio": ref_wav, "text": "dress rehearsal of the full chain"})

    import asyncio

    status, headers, out = asyncio.new_event_loop().run_until_complete(
        server.handle("POST", "/synthesize", {"duration": "1.0"},
                      {"content-type": ctype}, body))
    assert status == 200, out[:200]
    assert out[:4] == b"RIFF" and len(out) > 44
    server._batcher.close()
