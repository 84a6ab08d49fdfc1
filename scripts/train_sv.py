"""SV distillation CLI (reference: src/scripts/train/dmd2/sv.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200_000)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--codec-checkpoint", default=None)
    ap.add_argument("--checkpoint-dir", default="assets/sv_checkpoints")
    args = ap.parse_args()

    from smalltts_tpu.train.sv_train import SVTrainConfig, train_sv
    from smalltts_tpu.utils import checkpoint as ckpt

    codec_params = (
        ckpt.load_pytree(args.codec_checkpoint) if args.codec_checkpoint else None
    )
    train_sv(
        SVTrainConfig(num_steps=args.steps, batch_size=args.batch_size),
        codec_params=codec_params,
        checkpoint_dir=args.checkpoint_dir,
    )


if __name__ == "__main__":
    main()
