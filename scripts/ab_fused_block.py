"""A/B the whole-scan Pallas block kernel vs the XLA scan on real TPU.

Measures the exact graph the kernel replaces — dit_forward_cached (one
denoise pass: 12 blocks over the cross-KV cache) — in-graph via a K-rep
lax.scan so dispatch cancels, at the headline serving cell and optionally
others. One JSON line per cell.

    python scripts/ab_fused_block.py [--cells 8x40 1x40 8x120]
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
    ap.add_argument("--cells", nargs="*", default=["8x40", "1x40", "8x120"],
                    help="BxT latent cells (R=64, P=128 fixed)")
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

    from smalltts_tpu.models.backbone import (
        BackboneConfig,
        encode_conditions,
        init_backbone,
    )
    from smalltts_tpu.models.dit import fuse_serving_projections, pack_fused_block
    from smalltts_tpu.models.backbone import denoise_step
    from smalltts_tpu.ops.masking import length_mask
    from smalltts_tpu.ops.pallas.block import fits_vmem
    from smalltts_tpu.utils.checkpoint import cast_floating
    from smalltts_tpu.utils.flops import compiled_cost, utilization

    cfg = BackboneConfig()
    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    params = jax.jit(lambda k: init_backbone(k, cfg))(jax.random.PRNGKey(0))
    params = cast_floating(params, dtype)
    params = fuse_serving_projections(params)
    packed = pack_fused_block(params)

    R, P = 64, 128
    for cell in args.cells:
        B, T = (int(v) for v in cell.split("x"))
        rng = np.random.RandomState(0)
        ref = jnp.asarray(rng.randn(B, R, cfg.latent_dim), dtype)
        ref_lens = jnp.full((B,), R, jnp.int32)
        ph = jnp.asarray(rng.randint(1, 150, (B, P)), jnp.int32)
        ph_mask = length_mask(jnp.full((B,), P - 9, jnp.int32), P)
        cond = jax.jit(encode_conditions, static_argnums=(1,))(
            params, cfg, ref, ref_lens, ph, ph_mask)
        x = jnp.asarray(rng.randn(B, T, cfg.latent_dim), dtype)
        mask = length_mask(jnp.full((B,), T - 2, jnp.int32), T)
        t = jnp.full((B,), 0.7, jnp.float32)

        def make_rep(p):
            @jax.jit
            def rep(p, cond, x, key):
                def body(c, kk):
                    dt = jax.random.uniform(kk, (B,), jnp.float32)
                    return c + 1e-3 * denoise_step(p, cfg, c, mask, t + 0 * dt,
                                                   cond).astype(c.dtype), None
                out, _ = lax.scan(body, x, jax.random.split(key, args.k))
                return jnp.sum(out.astype(jnp.float32))

            @jax.jit
            def rep1(p, cond, x, key):
                return jnp.sum(denoise_step(p, cfg, x, mask, t, cond)
                               .astype(jnp.float32))

            return rep, rep1

        out = {"cell": cell, "k": args.k,
               "fits_vmem": fits_vmem(B, T, R + P, cfg.dit.heads,
                                      cfg.dit.head_dim, cfg.hidden_dim,
                                      cfg.dit.ff_dim)}
        for name, p in (("xla", params), ("pallas", packed)):
            try:
                rep, rep1 = make_rep(p)
                for f in (rep1, rep):
                    float(f(p, cond, x, jax.random.PRNGKey(0)))
                t1s, tks = [], []
                for i in range(1, 4):
                    t0 = time.perf_counter()
                    float(rep1(p, cond, x, jax.random.PRNGKey(i)))
                    tm = time.perf_counter()
                    float(rep(p, cond, x, jax.random.PRNGKey(i)))
                    t1s.append(tm - t0)
                    tks.append(time.perf_counter() - tm)
                ms = 1e3 * max(min(tks) - min(t1s), 1e-9) / (args.k - 1)
                out[f"{name}_ms"] = round(ms, 3)
                c = compiled_cost(rep1, p, cond, x, jax.random.PRNGKey(0))
                if c:
                    u = utilization(c["flops"], c["bytes"], ms / 1e3)
                    out[f"{name}_mfu"] = u["mfu"]
                    out[f"{name}_hbm_frac"] = u["hbm_frac"]
                # numerics cross-check on the single pass
                if name == "pallas" and "xla_out" in out:
                    a = out.pop("xla_out")
                    b = float(rep1(p, cond, x, jax.random.PRNGKey(9)))
                    out["sum_rel"] = round(abs(a - b) / (abs(a) + 1e-9), 6)
                elif name == "xla":
                    out["xla_out"] = float(rep1(p, cond, x,
                                                jax.random.PRNGKey(9)))
            except Exception as exc:
                out[f"{name}_error"] = f"{type(exc).__name__}: {exc}"[:300]
        out.pop("xla_out", None)
        if "xla_ms" in out and "pallas_ms" in out:
            out["speedup"] = round(out["xla_ms"] / out["pallas_ms"], 3)
        print(json.dumps(out))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
