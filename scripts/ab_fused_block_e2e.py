"""End-to-end A/B of the fused-block kernel inside the REAL serving graph.

Unlike scripts/ab_fused_block.py (which reps `denoise_step`, paying the
per-call modulation compute the real sampler hoists), this probes the
full fused synthesis graph — text encode + 4-step sampler + codec decode
— via the same in-graph K-repeat methodology as bench.py's probe, once
with the XLA block scan and once with SmallTTS(fused_block=True).

    python scripts/ab_fused_block_e2e.py [--cells 5x8 5x32] [--k 16]

One JSON line per cell: {"cell", "xla_ms", "pallas_ms", "speedup"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", nargs="*", default=["5x8", "5x32"],
                    help="DURxBATCH cells (duration seconds x batch)")
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from smalltts_tpu.data.bucketing import (
        LATENT_BUCKETS,
        SERVING_PHONEME_BUCKETS,
        SERVING_REF_BUCKETS,
        frames_for_duration,
        pad_to,
        pick_bucket,
    )
    from smalltts_tpu.infer.pipeline import SmallTTS

    arms = {"xla": SmallTTS(seed=0),
            "pallas": SmallTTS(seed=0, fused_block=True)}

    ref_frames = frames_for_duration(2.0)
    rng = np.random.RandomState(0)
    ref_lat = rng.randn(ref_frames, 64).astype(np.float32)
    token_ids = list(range(1, 31))

    for cell in args.cells:
        dur_s, bs_s = cell.split("x")
        dur, bs = float(dur_s), int(bs_s)
        seq = frames_for_duration(dur)
        t_bucket = pick_bucket(seq, LATENT_BUCKETS)
        r_bucket = pick_bucket(ref_frames, SERVING_REF_BUCKETS)
        p_bucket = pick_bucket(len(token_ids), SERVING_PHONEME_BUCKETS)
        out = {"cell": cell, "k": args.k, "t_bucket": t_bucket}
        sums = {}
        for name, tts in arms.items():
            ref = jnp.asarray(
                np.repeat(pad_to(ref_lat, r_bucket, 0)[None], bs, axis=0),
                tts.dtype)
            ref_lens = jnp.full((bs,), ref_frames, jnp.int32)
            ph = np.zeros((bs, p_bucket), np.int32)
            ph[:, :len(token_ids)] = token_ids
            ph = jnp.asarray(ph)
            ph_lens = jnp.full((bs,), len(token_ids), jnp.int32)
            seq_lens = jnp.full((bs,), seq, jnp.int32)
            pure = tts._synthesize_fn.pure_fn
            params, codec_params = tts.params, tts.codec_params

            def make_rep(k):
                # same methodology as bench.py's in-graph probe: perturb
                # BOTH conditioning inputs per iteration so nothing is
                # loop-invariant (else XLA hoists the text encode and the
                # probe under-counts)
                def body(carry, key):
                    import jax.random as jr
                    ref_k = ref + 1e-3 * jr.normal(key, ref.shape, ref.dtype)
                    jit_ids = jr.randint(key, ph.shape, 0, 3)
                    ph_k = jnp.where(ph > 0, 1 + ((ph - 1 + jit_ids) % 196),
                                     ph)
                    audio = pure(params, codec_params, ref_k, ref_lens,
                                 ph_k, ph_lens, seq_lens, key, t_bucket)
                    return carry + jnp.sum(audio.astype(jnp.float32)), None

                @jax.jit
                def rep(key):
                    out, _ = lax.scan(body, 0.0, jax.random.split(key, k))
                    return out

                return rep

            try:
                rep1, repk = make_rep(1), make_rep(args.k)
                for f in (rep1, repk):
                    float(f(jax.random.PRNGKey(0)))
                t1s, tks = [], []
                for i in range(1, 4):
                    t0 = time.perf_counter()
                    float(rep1(jax.random.PRNGKey(i)))
                    tm = time.perf_counter()
                    float(repk(jax.random.PRNGKey(i)))
                    t1s.append(tm - t0)
                    tks.append(time.perf_counter() - tm)
                ms = 1e3 * max(min(tks) - min(t1s), 1e-9) / (args.k - 1)
                out[f"{name}_ms"] = round(ms, 3)
                sums[name] = float(rep1(jax.random.PRNGKey(9)))
            except Exception as exc:
                out[f"{name}_error"] = f"{type(exc).__name__}: {exc}"[:300]
        if "xla" in sums and "pallas" in sums:
            out["sum_rel"] = round(
                abs(sums["xla"] - sums["pallas"])
                / (abs(sums["xla"]) + 1e-9), 6)
        if "xla_ms" in out and "pallas_ms" in out:
            out["speedup"] = round(out["xla_ms"] / out["pallas_ms"], 3)
        print(json.dumps(out))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
