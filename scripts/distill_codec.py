"""Distill the imported VibeVoice ONNX codec into the fast sub-pixel codec.

Usage:
  python scripts/distill_codec.py [--steps N] [--batch-size B]
                                  [--assets assets/codec]
                                  [--checkpoint-dir assets/codec_checkpoints]
                                  [--wav-dir DIR]   # real audio corpus

Teacher: assets/codec/{encoder,decoder}.onnx via the in-repo ONNX importer.
Student: models/codec.py (the serving codec). With --wav-dir absent, trains
on synthetic tones+noise (smoke/bring-up; use real audio for production).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def wav_dir_iter(path: str, batch_size: int, samples: int, seed: int = 0):
    from smalltts_tpu.serving import audio_io

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".wav")
    )
    if not files:
        raise SystemExit(f"no .wav files under {path}")
    rng = np.random.RandomState(seed)
    # decode lazily with a bounded LRU: eagerly decoding a real corpus to
    # fp32 up front is O(corpus) resident memory (50 h ≈ 17 GB) — the
    # trainer would OOM before step 1. The cache keeps batches hot once the
    # sampler revisits clips.
    from collections import OrderedDict

    cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
    cache_cap = 256

    def get_clip(idx: int) -> np.ndarray:
        clip = cache.get(idx)
        if clip is None:
            clip = audio_io.decode_and_resample(
                open(files[idx], "rb").read(), 24_000)
            cache[idx] = clip
            while len(cache) > cache_cap:
                cache.popitem(last=False)
        else:
            cache.move_to_end(idx)
        return clip

    while True:
        batch = []
        for _ in range(batch_size):
            clip = get_clip(rng.randint(len(files)))
            if len(clip) < samples:
                clip = np.pad(clip, (0, samples - len(clip)))
            start = rng.randint(max(len(clip) - samples, 0) + 1)
            batch.append(clip[start : start + samples])
        yield np.stack(batch).astype(np.float32)[:, None, :]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--assets", default="assets/codec")
    ap.add_argument("--checkpoint-dir", default="assets/codec_checkpoints")
    ap.add_argument("--wav-dir", default=None)
    args = ap.parse_args()

    from smalltts_tpu.models.codec import CodecConfig
    from smalltts_tpu.onnxjax.codec import OnnxCodec
    from smalltts_tpu.train.codec_distill import (
        CodecDistillConfig,
        train_codec_distill,
    )

    enc = os.path.join(args.assets, "encoder.onnx")
    dec = os.path.join(args.assets, "decoder.onnx")
    if not os.path.isfile(dec):
        print(f"missing {dec}; fetch codec assets first", file=sys.stderr)
        return 1
    teacher = OnnxCodec(enc if os.path.isfile(enc) else None, dec)

    cfg = CodecDistillConfig(
        num_steps=args.steps, batch_size=args.batch_size,
        seconds_per_sample=args.seconds,
    )
    codec_cfg = CodecConfig()
    data_iter = None
    if args.wav_dir:
        samples = int(args.seconds * 24_000)
        samples -= samples % codec_cfg.hop
        data_iter = wav_dir_iter(args.wav_dir, args.batch_size, samples)
    else:
        print("warn: no --wav-dir, training on synthetic audio (smoke only)",
              file=sys.stderr)
    _, metrics = train_codec_distill(
        cfg, codec_cfg, teacher=teacher, data_iter=data_iter,
        checkpoint_dir=args.checkpoint_dir,
    )
    print("final:", metrics)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
