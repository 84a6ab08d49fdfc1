"""Integral-velocity distillation CLI: 4-step student -> 1-2 step sampler.

Beyond the reference (which stops at 4-step DMD); technique after
PAPERS.md's IntMeanFlow. Start from the teacher EMA (or the DMD student),
then sample with smalltts_tpu.train.imf.imf_sample(num_steps=1).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40_000)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--teacher",
                    default="assets/teacher_checkpoints/checkpoint_ema.npz",
                    help="teacher weights (.npz or reference torch .pt)")
    ap.add_argument("--checkpoint-dir", default="assets/imf_checkpoints")
    ap.add_argument("--substeps", type=int, default=4,
                    help="teacher DDIM substeps per distilled interval")
    ap.add_argument("--boundary-prob", type=float, default=0.0,
                    help="fraction of samples trained on the r = t boundary "
                         "pair (MeanFlow boundary condition; pins u(x,t,t) "
                         "to the teacher's instantaneous velocity — corpus-"
                         "measured tradeoff, see scripts/exp_imf_boundary.py)")
    ap.add_argument("--focus-prob", type=float, default=0.5,
                    help="fraction of samples trained on the exact serving-"
                         "grid intervals (round-4 corpus grid: the largest "
                         "single IMF-2 win, -36%% mel excess; see PERF.md)")
    ap.add_argument("--gan-weight", type=float, default=0.0,
                    help="LSGAN weight on the full-interval x0 prediction "
                         "(the reference's DMD2 adversarial recipe "
                         "transplanted; corpus-measured best for the 1-step "
                         "path, see PERF.md round-4 wave 2)")
    ap.add_argument("--dmd-weight", type=float, default=0.0,
                    help="weight on the DMD distribution-matching pseudo-"
                         "loss over the served few-step composition (the "
                         "reference's core DMD2 gradient, distill.py:289-"
                         "328, transplanted; adds a fake-score model with "
                         "an imf_scorer_latest.npz sidecar — see PERF.md "
                         "round-4 wave 5)")
    ap.add_argument("--rollin-prob", type=float, default=0.0,
                    help="fraction of samples trained as the second serving "
                         "interval on the student's OWN first-step rollout "
                         "(backward simulation, reference distill.py:248-287; "
                         "corpus-measured equal to focus for 2-step serving, "
                         "doesn't stack with it — PERF.md round-4 wave 4)")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--data-codec-checkpoint", default=None)
    args = ap.parse_args()

    from smalltts_tpu.data.local import cli_data_iter
    from smalltts_tpu.train.imf import ImfConfig, train_imf
    from smalltts_tpu.utils import checkpoint as ckpt

    if args.teacher.endswith((".pt", ".pth", ".bin")):
        teacher = ckpt.load_reference_backbone_checkpoint(args.teacher)
    else:
        teacher = ckpt.load_pytree(args.teacher)

    train_imf(
        ImfConfig(num_steps=args.steps, batch_size=args.batch_size,
                  rollout_substeps=args.substeps,
                  boundary_prob=args.boundary_prob,
                  focus_prob=args.focus_prob,
                  gan_weight=args.gan_weight,
                  dmd_weight=args.dmd_weight,
                  rollin_prob=args.rollin_prob),
        teacher_params=teacher,
        checkpoint_dir=args.checkpoint_dir,
        data_iter=cli_data_iter(args.data_dir, args.data_codec_checkpoint,
                                args.batch_size),
    )


if __name__ == "__main__":
    main()
