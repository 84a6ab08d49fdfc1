"""Multi-host dryrun: two local processes, one global mesh, one teacher step.

Validates the DCN story without a pod: each worker process gets 2 virtual
CPU devices, joins via `jax.distributed.initialize` (the exact plumbing in
parallel/multihost.py, driven by SMALLTTS_* env vars), forms a global
4-device dp mesh SPANNING both processes, feeds its local half of the
global batch through `local_batch_to_global`, runs one jitted teacher step
(gradient psum crosses the process boundary), and writes a single-writer
checkpoint from the coordinator.

PASS criteria (checked by the parent):
  * both ranks report the SAME finite loss (replica consistency — the
    cross-process psum agrees);
  * the loss matches a single-process 4-device run of the same step to
    float tolerance (the process boundary changes nothing numerically);
  * exactly one checkpoint file exists afterwards (single-writer).

Matches the reference's `accelerate launch` multi-node coverage
(reference: README.md:101-104, src/scripts/train/teacher.py:49) per
SURVEY.md section 5's stated JAX equivalent.

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


def _run_step(mesh, batch_global, ckpt_path=None):
    import jax

    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.parallel.mesh import replicated
    from smalltts_tpu.parallel.multihost import save_on_coordinator
    from smalltts_tpu.train.optim import adamw
    from smalltts_tpu.train.teacher import make_teacher_step
    from smalltts_tpu.train.ema import ema_init
    from tests.tiny import TINY_BACKBONE

    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    tx = adamw(params, 1e-4)
    params = replicated(params, mesh)
    opt_state = replicated(tx.init(params), mesh)
    ema = replicated(ema_init(params), mesh)
    step = make_teacher_step(TINY_BACKBONE, tx)
    params, opt_state, ema, loss = step(params, opt_state, ema, batch_global,
                                        jax.random.PRNGKey(3))
    loss = float(loss)
    wrote = False
    if ckpt_path is not None:
        wrote = save_on_coordinator(ckpt_path, ema)
    return loss, wrote


def worker(rank: int, coordinator: str, ckpt_path: str) -> None:
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

    mesh = global_mesh(tp=1)  # dp=4 across 2 processes
    local_bs = GLOBAL_BATCH // NUM_PROCESSES
    lo, hi = rank * local_bs, (rank + 1) * local_bs
    local = {k: v[lo:hi] for k, v in _make_global_batch().items()}
    batch_global = local_batch_to_global(local, mesh)
    for v in batch_global.values():
        assert v.shape[0] == GLOBAL_BATCH, v.shape  # global view everywhere

    loss, wrote = _run_step(mesh, batch_global, ckpt_path)
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


def main() -> int:
    import socket

    # pick a free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coordinator = f"127.0.0.1:{port}"

    tmp = tempfile.mkdtemp(prefix="dryrun_multihost_")
    ckpt_path = os.path.join(tmp, "ema.npz")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(rank),
             coordinator, ckpt_path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO,
        )
        for rank in range(NUM_PROCESSES)
    ]
    results = {}
    ok = True
    for rank, p in enumerate(procs):
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            print(f"rank {rank} FAILED rc={p.returncode}\n{err[-2000:]}")
            ok = False
            continue
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results[rank] = json.loads(line)
    if not ok:
        return 1

    losses = [results[r]["loss"] for r in range(NUM_PROCESSES)]
    writers = [results[r]["wrote_ckpt"] for r in range(NUM_PROCESSES)]
    import numpy as np

    assert all(np.isfinite(losses)), losses
    assert losses[0] == losses[1], f"replica divergence: {losses}"
    assert writers == [True, False], f"single-writer violated: {writers}"
    assert os.path.isfile(ckpt_path), "coordinator checkpoint missing"

    ref_loss = single_process_reference()
    rel = abs(losses[0] - ref_loss) / max(abs(ref_loss), 1e-9)
    assert rel < 2e-4, (
        f"multi-process loss {losses[0]} != single-process {ref_loss} "
        f"(rel {rel:.2e})")
    print(json.dumps({
        "ok": True, "loss": losses[0], "single_process_loss": ref_loss,
        "rel_diff": rel, "ckpt": ckpt_path,
        "summary": f"2 processes x {DEVICES_PER_PROCESS} devices, dp=4 "
                   "teacher step: replica-consistent, matches single-process, "
                   "single-writer checkpoint",
    }))
    return 0


if __name__ == "__main__":
    if sys.argv[1:2] in (["-h"], ["--help"]):
        print(__doc__.strip())  # help must not spawn workers (review r3)
    elif len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        sys.exit(main())
