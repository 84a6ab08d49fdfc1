"""DMD2 distillation CLI (reference: accelerate launch src/scripts/train/dmd2/distill.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40_000)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--teacher", default="assets/teacher_checkpoints/checkpoint_ema.npz")
    ap.add_argument("--asr", default="assets/asr_checkpoints/checkpoint_latest.npz")
    ap.add_argument("--sv", default="assets/sv_checkpoints/checkpoint_latest.npz")
    ap.add_argument("--checkpoint-dir", default="assets/dmd_checkpoints")
    ap.add_argument("--data-dir", default=None,
                    help="local corpus (metadata.csv or paired .wav/.txt); "
                         "default: dummy random tensors")
    ap.add_argument("--data-codec-checkpoint", default=None,
                    help="native codec weights for corpus encoding")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel ways (0 = single device); multi-host "
                         "via SMALLTTS_COORDINATOR env (parallel/multihost.py)")
    args = ap.parse_args()

    from smalltts_tpu.data.local import cli_data_iter

    from smalltts_tpu.parallel.multihost import auto_mesh
    from smalltts_tpu.train.distill import DistillConfig, train_distill

    train_distill(
        DistillConfig(num_steps=args.steps, batch_size=args.batch_size),
        mesh=auto_mesh(dp=args.dp, tp=1),
        teacher_checkpoint=args.teacher,
        asr_checkpoint=args.asr,
        sv_checkpoint=args.sv,
        checkpoint_dir=args.checkpoint_dir,
        data_iter=cli_data_iter(args.data_dir, args.data_codec_checkpoint, args.batch_size),
    )


if __name__ == "__main__":
    main()
