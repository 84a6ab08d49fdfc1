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
    ap.add_argument("--teacher-checkpoint", default=None,
                    help="speechbrain embedding_model.ckpt (torch) or our .npz "
                         "of the voxceleb ECAPA teacher; falls back to the "
                         "deterministic stand-in when omitted")
    ap.add_argument("--data-dir", default=None,
                    help="local corpus (metadata.csv or paired .wav/.txt); "
                         "default: dummy random tensors")
    ap.add_argument("--data-codec-checkpoint", default=None,
                    help="native codec weights for corpus encoding")
    args = ap.parse_args()

    from smalltts_tpu.data.local import cli_data_iter

    from smalltts_tpu.train.sv_train import SVTrainConfig, train_sv
    from smalltts_tpu.utils import checkpoint as ckpt

    codec_params = (
        ckpt.load_pytree(args.codec_checkpoint) if args.codec_checkpoint else None
    )
    teacher_fn = teacher_params = None
    if args.teacher_checkpoint:
        from smalltts_tpu.models.sv_teacher import load_teacher, make_teacher_fn

        teacher_fn, teacher_params = make_teacher_fn(
            load_teacher(args.teacher_checkpoint)
        )
    train_sv(
        SVTrainConfig(num_steps=args.steps, batch_size=args.batch_size),
        codec_params=codec_params,
        teacher_fn=teacher_fn,
        teacher_params=teacher_params,
        checkpoint_dir=args.checkpoint_dir,
        data_iter=cli_data_iter(args.data_dir, args.data_codec_checkpoint, args.batch_size),
    )


if __name__ == "__main__":
    main()
