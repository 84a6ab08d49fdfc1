"""Local-corpus data pipeline (the real-data bridge the reference lacks —
its only loader is random tensors, src/smalltts/data/dummy.py)."""

import os

import numpy as np
import pytest

import jax

from smalltts_tpu.data.local import (
    LocalDataConfig,
    LocalDataset,
    get_local_dataloader,
    scan_corpus,
)
from smalltts_tpu.serving import audio_io

HOP = 20  # tiny codec hop for fast tests
CFG = LocalDataConfig(batch_size=2, latent_dim=8, max_phonemes=32,
                      max_latents=24, max_ref=8, min_latents=4, hop=HOP)


def fake_encode(audio):
    """Deterministic stand-in codec encoder: (B,1,T) -> (B, T//HOP, 8),
    frame index embedded so crop provenance is checkable."""
    b, _, t = audio.shape
    frames = audio[:, 0, : (t // HOP) * HOP].reshape(b, t // HOP, HOP)
    feat = np.zeros((b, t // HOP, 8), np.float32)
    feat[..., 0] = frames.mean(-1)
    feat[..., 1] = np.arange(t // HOP)[None, :]
    return feat


def _write_corpus(root, n=4, with_metadata=False, seconds=0.5):
    os.makedirs(root, exist_ok=True)
    sr = 24_000
    lines = []
    for i in range(n):
        t = np.arange(int(seconds * sr))
        wav = (0.3 * np.sin(2 * np.pi * (100 + 50 * i) * t / sr)).astype(np.float32)
        with open(os.path.join(root, f"clip{i}.wav"), "wb") as f:
            f.write(audio_io.encode_wav(wav, sr))
        text = f"hello clip number {i}"
        if with_metadata:
            lines.append(f"clip{i}.wav|{text}")
        else:
            open(os.path.join(root, f"clip{i}.txt"), "w").write(text)
    if with_metadata:
        open(os.path.join(root, "metadata.csv"), "w").write("\n".join(lines))


def test_scan_corpus_both_layouts(tmp_path):
    a, b = tmp_path / "sidecar", tmp_path / "meta"
    _write_corpus(str(a), 3, with_metadata=False)
    _write_corpus(str(b), 3, with_metadata=True)
    assert len(scan_corpus(str(a))) == 3
    pairs = scan_corpus(str(b))
    assert len(pairs) == 3
    assert pairs[0][1] == "hello clip number 0"


def test_dataset_batch_contract(tmp_path):
    _write_corpus(str(tmp_path), 4)
    ds = LocalDataset(str(tmp_path), fake_encode, CFG)
    assert len(ds) == 4
    rng = np.random.default_rng(0)
    batch = ds.sample_batch(rng)
    assert batch["phonemes"].shape == (2, 32)
    assert batch["latents"].shape == (2, 24, 8)
    assert batch["ref_latents"].shape == (2, 8, 8)
    for key in ("phonemes_lengths", "latents_lengths", "ref_latents_lengths"):
        assert batch[key].shape == (2,) and (batch[key] >= 1).all()
    # padding beyond the true length is exactly zero
    for i in range(2):
        assert (batch["latents"][i, batch["latents_lengths"][i]:] == 0).all()
        assert (batch["phonemes"][i, batch["phonemes_lengths"][i]:] == 0).all()


def test_ref_crop_disjoint_from_target_when_possible(tmp_path):
    _write_corpus(str(tmp_path), 1, seconds=1.0)  # 1200 frames of hop 20... 60 frames
    cfg = LocalDataConfig(batch_size=1, latent_dim=8, max_phonemes=32,
                          max_latents=20, max_ref=8, min_latents=4, hop=HOP)
    ds = LocalDataset(str(tmp_path), fake_encode, cfg)
    rng = np.random.default_rng(1)
    for _ in range(20):
        b = ds.sample_batch(rng)
        t_idx = b["latents"][0, : b["latents_lengths"][0], 1]  # frame indices
        r_idx = b["ref_latents"][0, : b["ref_latents_lengths"][0], 1]
        assert not set(t_idx.tolist()) & set(r_idx.tolist()), "ref overlaps target"


def test_too_short_clips_rejected(tmp_path):
    _write_corpus(str(tmp_path), 2, seconds=0.002)  # < min_latents*hop
    with pytest.raises(ValueError, match="shorter"):
        LocalDataset(str(tmp_path), fake_encode, CFG)


def test_loader_feeds_teacher_training(tmp_path):
    """End to end: corpus -> batches -> 2 teacher steps, finite loss."""
    from smalltts_tpu.train.teacher import TeacherTrainConfig, train_teacher
    from tests.tiny import TINY_BACKBONE

    _write_corpus(str(tmp_path), 3)
    cfg = LocalDataConfig(batch_size=2, latent_dim=64, max_phonemes=32,
                          max_latents=24, max_ref=8, min_latents=4, hop=HOP)

    def encode64(audio):
        f = fake_encode(audio)
        return np.tile(f, (1, 1, 8))

    it = get_local_dataloader(str(tmp_path), encode64, cfg)
    batch = next(it)
    assert batch["latents"].shape[-1] == 64
    params, ema = train_teacher(
        TeacherTrainConfig(num_steps=2, batch_size=2, save_every=1000),
        model_cfg=TINY_BACKBONE,
        data_iter=it,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert params is not None


def test_scan_corpus_ljspeech_three_field_metadata(tmp_path):
    """Real LJSpeech metadata is id|raw|normalized: the transcript must be
    the normalized field alone, never 'raw|normalized' (review r3 — a
    partition('|') fed the stray delimiter and doubled text into the
    phonemizer)."""
    import os

    root = str(tmp_path / "lj")
    os.makedirs(root)
    _write_corpus(root, 1, with_metadata=False)  # provides clip0.wav
    os.remove(os.path.join(root, "clip0.txt"))
    open(os.path.join(root, "metadata.csv"), "w").write(
        "clip0|Dr. Smith said 1 thing.|Doctor Smith said one thing.\n")
    pairs = scan_corpus(root)
    assert pairs[0][1] == "Doctor Smith said one thing."
    assert pairs[0][0].endswith("clip0.wav")
    # 2-field lines keep working, and an empty normalized field falls back
    open(os.path.join(root, "metadata.csv"), "w").write(
        "clip0|only text here\n")
    assert scan_corpus(root)[0][1] == "only text here"
    open(os.path.join(root, "metadata.csv"), "w").write(
        "clip0|raw only|\n")
    assert scan_corpus(root)[0][1] == "raw only"


def test_batch_texts_are_transcript_strings(tmp_path):
    """The documented drop-in contract with data/dummy.py: batch['texts']
    carries the transcript STRINGS (review r3 — it carried utterance
    indices)."""
    root = str(tmp_path / "c")
    _write_corpus(root, 2, with_metadata=True)
    ds = LocalDataset(root, fake_encode, CFG)
    batch = ds.sample_batch(np.random.default_rng(0))
    assert all(isinstance(t, str) and t.startswith("hello clip") for t in
               batch["texts"])


def test_corrupt_clip_skipped_not_fatal(tmp_path, capfd):
    """One corrupt (or unsupported-rate) wav must skip with a warning, not
    kill corpus prep — pool.map re-raises prep exceptions at collection
    (review r3 continuation; surfaced by the serving-side resample bounds)."""
    root = tmp_path / "corpus"
    _write_corpus(str(root), n=3)
    (root / "bad.wav").write_bytes(b"RIFFgarbage-not-a-wav")
    (root / "bad.txt").write_text("corrupt clip")
    ds = LocalDataset(str(root), fake_encode, CFG)
    assert len(ds) == 3  # the three good clips survive
    err = capfd.readouterr().err
    assert "skipping" in err and "bad.wav" in err
