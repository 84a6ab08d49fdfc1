"""Capture a jax.profiler trace of the synthesis graph.

Usage:
  python scripts/profile.py [--out out/trace] [--duration 5.0] [--batch 8]
                            [--runs 5] [--checkpoint ...]

Writes a TensorBoard-compatible trace directory (xplane) covering `runs`
fused-synthesis executions — open with TensorBoard's profile plugin or
xprof. The reference has no profiler integration at all (SURVEY.md §5:
"No torch profiler, no flamegraphs").
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="out/trace")
    ap.add_argument("--duration", type=float, default=5.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from smalltts_tpu.data.bucketing import (
        LATENT_BUCKETS,
        SERVING_PHONEME_BUCKETS,
        SERVING_REF_BUCKETS,
        frames_for_duration,
        pick_bucket,
    )
    from smalltts_tpu.infer.pipeline import SmallTTS

    tts = SmallTTS(checkpoint=args.checkpoint)
    seq = frames_for_duration(args.duration)
    t_bucket = pick_bucket(seq, LATENT_BUCKETS)
    r_bucket = SERVING_REF_BUCKETS[0]
    p_bucket = SERVING_PHONEME_BUCKETS[0]
    bs = args.batch
    rng = np.random.RandomState(0)
    inputs = (
        jnp.asarray(rng.randn(bs, r_bucket, tts.cfg.latent_dim), tts.dtype),
        jnp.full((bs,), r_bucket, jnp.int32),
        jnp.asarray(rng.randint(1, 100, (bs, p_bucket)), jnp.int32),
        jnp.full((bs,), 30, jnp.int32),
        jnp.full((bs,), seq, jnp.int32),
    )

    def run(i):
        return tts._synthesize_fn(
            tts.params, tts.codec_params, *inputs,
            jax.random.PRNGKey(i), t_bucket=t_bucket,
        )

    jax.block_until_ready(run(0))  # compile outside the trace
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        out = None
        for i in range(args.runs):
            out = run(i + 1)
        jax.block_until_ready(out)
    print(f"trace written to {args.out} "
          f"({args.runs} runs of {args.duration}s x batch {bs})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
