"""Multi-host dryrun: two local processes, one global mesh, one teacher step.

Validates the DCN story without a pod, in TWO phases: each worker process
gets 2 virtual CPU devices, joins via `jax.distributed.initialize` (the
exact plumbing in parallel/multihost.py, driven by SMALLTTS_* env vars),
forms a global 4-device mesh SPANNING both processes, feeds its local half
of the global batch through `local_batch_to_global`, runs one jitted
teacher step, and writes a single-writer checkpoint from the coordinator.

  phase 1  dp=4, tp=1 — pure data parallel: the gradient psum crosses the
           process boundary (DCN in production).
  phase 2  dp=2 x tp=2 — the scaling-book split: tensor-parallel shards
           stay WITHIN each process (ICI in production; device order keeps
           tp groups process-local), data parallel crosses processes
           (DCN). Params are shape-driven-sharded over tp, so the EMA
           checkpoint is NOT fully addressable on any process and
           `save_on_coordinator` must gather shards across processes
           (multihost_utils.process_allgather) before the single write —
           this phase is what proves that path.

PASS criteria (checked by the parent, per phase):
  * both ranks report the SAME finite loss (replica consistency);
  * the loss matches a single-process 4-device run of the same step to
    float tolerance (the process boundary changes nothing numerically);
  * exactly one checkpoint file exists afterwards (single-writer), and in
    phase 2 the written leaves have FULL (unsharded) shapes.

Matches the reference's `accelerate launch` multi-node coverage
(reference: README.md:101-104, src/scripts/train/teacher.py:49) per
SURVEY.md section 5's stated JAX equivalent — and goes beyond it (the
reference has no tensor parallelism anywhere, SURVEY.md section 2.6).

Usage:  python scripts/dryrun_multihost.py          # parent: spawns workers
        (workers are re-invocations with --worker N, wired via env vars)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 2
GLOBAL_BATCH = 4
SEED = 11


def _make_global_batch():
    """Deterministic batch both the workers and the single-process check
    slice from."""
    import numpy as np

    rng = np.random.RandomState(SEED)
    b, t_len, r, p = GLOBAL_BATCH, 12, 8, 10
    return {
        "latents": rng.randn(b, t_len, 64).astype(np.float32),
        "latents_lengths": np.full((b,), t_len, np.int32),
        "ref_latents": rng.randn(b, r, 64).astype(np.float32),
        "ref_latents_lengths": np.full((b,), r, np.int32),
        "phonemes": rng.randint(1, 190, size=(b, p)).astype(np.int32),
        "phonemes_lengths": np.full((b,), p, np.int32),
    }


def _run_step(mesh, batch_global, ckpt_path=None, tp_sharded=False):
    import jax

    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.parallel.mesh import replicated, shard_params
    from smalltts_tpu.parallel.multihost import save_on_coordinator
    from smalltts_tpu.train.optim import adamw
    from smalltts_tpu.train.teacher import make_teacher_step
    from smalltts_tpu.train.ema import ema_init
    from tests.tiny import TINY_BACKBONE

    # host-side trees first (identical on every process — same PRNG key),
    # then ONE device_put per tree with its explicit global sharding:
    # cross-process resharding of already-global arrays is not a path we
    # need, and this mirrors how real checkpoints restore into a mesh
    params_h = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    tx = adamw(params_h, 1e-4)
    if tp_sharded:
        # shape-driven NamedShardings (heads/FF hidden over tp) — same
        # helper the full-328M execution proof uses; ema mirrors params'
        # shardings so the saved tree is genuinely tp-sharded
        from smalltts_tpu.parallel.mesh import param_shardings

        params = shard_params(params_h, mesh)
        ema = jax.device_put(ema_init(params_h),
                             param_shardings(params_h, mesh))
        # optimizer moments mirror the param shardings (the layout a real
        # tp run uses — param_shardings' substring rules match the mu/nu
        # paths inside the optax state; replicated moments would make
        # GSPMD reshard and the dryrun would not exercise the real layout;
        # advisor r4)
        opt_h = tx.init(params_h)
        opt_state = jax.device_put(opt_h, param_shardings(opt_h, mesh))
    else:
        params = replicated(params_h, mesh)
        ema = replicated(ema_init(params_h), mesh)
        opt_state = replicated(tx.init(params_h), mesh)
    step = make_teacher_step(TINY_BACKBONE, tx)
    params, opt_state, ema, loss = step(params, opt_state, ema, batch_global,
                                        jax.random.PRNGKey(3))
    loss = float(loss)
    wrote = False
    if ckpt_path is not None:
        if tp_sharded:
            # the point of phase 2's checkpoint: EMA leaves mirror the
            # tp-sharded params, so shards are PARTIAL tensors spanning
            # both processes and the writer must allgather
            # (fetch_replicated's non-addressable branch). Prove we are
            # actually on that path: some leaf's shard is smaller than
            # the tensor.
            assert any(
                leaf.sharding.shard_shape(leaf.shape) != leaf.shape
                for leaf in jax.tree.leaves(ema)), \
                "expected tp-sharded EMA (shard shape != full shape)"
        wrote = save_on_coordinator(ckpt_path, ema)
    return loss, wrote


def worker(rank: int, coordinator: str, ckpt_path: str, tp: int = 1) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
    )
    os.environ["SMALLTTS_COORDINATOR"] = coordinator
    os.environ["SMALLTTS_NUM_PROCESSES"] = str(NUM_PROCESSES)
    os.environ["SMALLTTS_PROCESS_ID"] = str(rank)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from smalltts_tpu.parallel.multihost import (
        barrier,
        global_mesh,
        initialize_from_env,
        local_batch_to_global,
    )

    info = initialize_from_env()
    assert info["distributed"] and info["global_devices"] == (
        NUM_PROCESSES * DEVICES_PER_PROCESS
    ), info

    # tp=1 -> dp=4 across processes; tp=2 -> dp=2 across processes with
    # each tp pair inside one process (jax.devices() orders process-local
    # devices together)
    mesh = global_mesh(tp=tp)
    if tp > 1:
        for row in mesh.devices:  # each dp row = one tp group
            owners = {d.process_index for d in row}
            assert len(owners) == 1, (
                f"tp group spans processes: {owners} — ICI story broken")
    local_bs = GLOBAL_BATCH // NUM_PROCESSES
    lo, hi = rank * local_bs, (rank + 1) * local_bs
    local = {k: v[lo:hi] for k, v in _make_global_batch().items()}
    batch_global = local_batch_to_global(local, mesh)
    for v in batch_global.values():
        assert v.shape[0] == GLOBAL_BATCH, v.shape  # global view everywhere

    loss, wrote = _run_step(mesh, batch_global, ckpt_path, tp_sharded=tp > 1)
    barrier("dryrun-step-done")
    print(json.dumps({"rank": rank, "loss": loss, "wrote_ckpt": wrote,
                      "process_index": jax.process_index(),
                      "global_devices": len(jax.devices())}), flush=True)


def single_process_reference() -> float:
    """Same step on one 4-device process: the numeric anchor."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={GLOBAL_BATCH}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from smalltts_tpu.parallel.mesh import make_mesh
    from smalltts_tpu.parallel.multihost import local_batch_to_global

    mesh = make_mesh(dp=GLOBAL_BATCH, tp=1)
    batch = local_batch_to_global(_make_global_batch(), mesh)
    loss, _ = _run_step(mesh, batch)
    return loss


def _run_phase(tp: int, ckpt_path: str) -> dict:
    import socket

    # pick a free port for the coordinator (fresh per phase)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coordinator = f"127.0.0.1:{port}"

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(rank),
             coordinator, ckpt_path, str(tp)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO,
        )
        for rank in range(NUM_PROCESSES)
    ]
    # reap EVERY rank before judging: raising on the first failure would
    # orphan the other worker blocked on the distributed barrier (holding
    # the coordinator port) and hide its error output (review r4)
    outs, failures = {}, []
    for rank, p in enumerate(procs):
        try:
            outs[rank] = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            outs[rank] = p.communicate()
            failures.append(f"tp={tp} rank {rank} TIMED OUT")
        if p.returncode != 0:
            failures.append(f"tp={tp} rank {rank} FAILED rc={p.returncode}\n"
                            f"{outs[rank][1][-2000:]}")
    if failures:
        for p in procs:  # belt-and-braces: no worker may outlive the phase
            if p.poll() is None:
                p.kill()
        raise SystemExit("\n".join(failures))
    results = {}
    for rank, (out, _err) in outs.items():
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results[rank] = json.loads(line)

    losses = [results[r]["loss"] for r in range(NUM_PROCESSES)]
    writers = [results[r]["wrote_ckpt"] for r in range(NUM_PROCESSES)]
    import numpy as np

    assert all(np.isfinite(losses)), losses
    assert losses[0] == losses[1], f"tp={tp} replica divergence: {losses}"
    assert writers == [True, False], \
        f"tp={tp} single-writer violated: {writers}"
    assert os.path.isfile(ckpt_path), f"tp={tp} coordinator ckpt missing"
    return {"tp": tp, "loss": losses[0], "ckpt": ckpt_path}


def _check_ckpt_shapes_full(ckpt_path: str) -> int:
    """Phase-2 guarantee: the allgathered checkpoint holds FULL tensors
    (the tp shards were tiled back together, not stacked or truncated)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.utils.checkpoint import load_pytree
    from tests.tiny import TINY_BACKBONE

    ref = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    loaded = load_pytree(ckpt_path)
    ref_shapes = jax.tree.map(lambda x: tuple(x.shape), ref)
    got_shapes = jax.tree.map(lambda x: tuple(x.shape), loaded)
    assert ref_shapes == got_shapes, (
        "tp checkpoint shapes != full param shapes — allgather broken")
    return len(jax.tree.leaves(loaded))


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="dryrun_multihost_")

    # phase 1: pure dp across the process boundary (the reference's DDP)
    r_dp = _run_phase(tp=1, ckpt_path=os.path.join(tmp, "ema_dp.npz"))
    # phase 2: dp across processes x tp within each process (beyond the
    # reference — it has no TP anywhere, SURVEY.md section 2.6); exercises
    # the cross-process allgather in save_on_coordinator
    r_tp = _run_phase(tp=2, ckpt_path=os.path.join(tmp, "ema_dp_tp.npz"))

    # single_process_reference must run BEFORE any other in-parent jax use:
    # it sets the 4-device XLA flag, which only takes effect at backend init
    ref_loss = single_process_reference()
    n_leaves = _check_ckpt_shapes_full(r_tp["ckpt"])

    rels = {}
    for r in (r_dp, r_tp):
        rel = abs(r["loss"] - ref_loss) / max(abs(ref_loss), 1e-9)
        assert rel < 2e-4, (
            f"tp={r['tp']} loss {r['loss']} != single-process {ref_loss} "
            f"(rel {rel:.2e})")
        rels[f"rel_diff_tp{r['tp']}"] = rel
    print(json.dumps({
        "ok": True, "loss_dp": r_dp["loss"], "loss_dp_tp": r_tp["loss"],
        "single_process_loss": ref_loss, **rels,
        "tp_ckpt_leaves": n_leaves,
        "summary": f"2 processes x {DEVICES_PER_PROCESS} devices: dp=4 AND "
                   "dp=2 x tp=2 teacher steps replica-consistent, both match "
                   "single-process, single-writer checkpoints, tp ckpt "
                   "allgathered to full shapes",
    }))
    return 0


if __name__ == "__main__":
    if sys.argv[1:2] in (["-h"], ["--help"]):
        print(__doc__.strip())  # help must not spawn workers (review r3)
    elif len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], sys.argv[4],
               tp=int(sys.argv[5]) if len(sys.argv) > 5 else 1)
    else:
        sys.exit(main())
