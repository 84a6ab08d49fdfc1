"""Teacher training CLI (reference: `accelerate launch src/scripts/train/teacher.py`
-> here plain python; DP over all local devices via --dp)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=330_000)
    # measured defaults (PERF.md round-5 training MFU table, v5e-1): batch
    # 16 + bf16 compute = 5771 train-audio-s/s vs the reference recipe's
    # 1744 (BATCH=2 fp32, reference teacher.py:21-28) — 3.3x the data
    # throughput per chip; an equal-DATA run then needs 1/8 the steps.
    # NOTE at batch 16 the gradient is 8x less noisy than the reference
    # recipe tuned for; keep --steps for equal-STEPS runs, or scale lr
    # (linear rule: ~8x, with warmup) if replicating the 330k schedule
    # exactly is not the goal. `--batch-size 2 --compute-dtype float32`
    # reproduces the reference training recipe bit-for-bit in fp32.
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="forward/backward compute dtype; masters stay fp32 "
                         "(ops/precision.py)")
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--dp", type=int, default=0, help="data-parallel ways (0 = single device)")
    ap.add_argument("--checkpoint-dir", default="assets/teacher_checkpoints")
    ap.add_argument("--data-dir", default=None,
                    help="local corpus: metadata.csv ('wav|text') or paired "
                         ".wav/.txt files (default: dummy random tensors)")
    ap.add_argument("--codec-checkpoint", default=None,
                    help="native codec weights for corpus encoding (with "
                         "assets/codec/*.onnx present the imported VibeVoice "
                         "encoder is used instead)")
    args = ap.parse_args()

    from smalltts_tpu.train.teacher import TeacherTrainConfig, train_teacher

    # single device, --dp N local data-parallel, or multi-host via
    # SMALLTTS_COORDINATOR/NUM_PROCESSES/PROCESS_ID env vars (the
    # `accelerate launch` equivalent; see parallel/multihost.py) — in the
    # distributed case --batch-size is PER PROCESS and checkpoints/logs are
    # coordinator-only
    from smalltts_tpu.parallel.multihost import auto_mesh

    mesh = auto_mesh(dp=args.dp, tp=1)

    data_iter = None
    if args.data_dir:
        from smalltts_tpu.data.local import (
            LocalDataConfig,
            default_encode_fn,
            get_local_dataloader,
        )

        data_iter = get_local_dataloader(
            args.data_dir,
            default_encode_fn(args.codec_checkpoint),
            LocalDataConfig(batch_size=args.batch_size),
        )

    train_teacher(
        TeacherTrainConfig(num_steps=args.steps, batch_size=args.batch_size,
                           compute_dtype=args.compute_dtype),
        mesh=mesh,
        pretrained=args.pretrained,
        resume_from=args.resume,
        checkpoint_dir=args.checkpoint_dir,
        data_iter=data_iter,
    )


if __name__ == "__main__":
    main()
