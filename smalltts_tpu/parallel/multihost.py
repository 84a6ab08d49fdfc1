"""Multi-host (DCN-spanning) training initialization.

The reference scales across nodes with `accelerate launch` (DDP over NCCL;
reference: README.md:101-104, src/scripts/train/teacher.py:49). The
TPU-native equivalent (SURVEY.md section 5) is `jax.distributed.initialize`
+ a process-spanning mesh: every process sees the GLOBAL device set, jit
compiles one SPMD program, and XLA routes gradient psums over ICI within a
slice and DCN across slices — no user-level collectives.

Environment contract (standard TPU pod env vars also work — on Cloud TPU,
`jax.distributed.initialize()` auto-discovers with no arguments):

    SMALLTTS_COORDINATOR   host:port of process 0          (required)
    SMALLTTS_NUM_PROCESSES total process count             (required)
    SMALLTTS_PROCESS_ID    this process's rank             (required)

Checkpointing is single-writer: only process 0 touches the filesystem
(`save_on_coordinator`), with non-addressable shards gathered first. This
mirrors the reference's `accelerator.is_main_process` gating
(src/scripts/train/teacher.py:160-171).

Validated end-to-end by scripts/dryrun_multihost.py: two local CPU
processes form one 4-device global mesh, run a dp-across-processes teacher
step, and assert bit-identical losses on both ranks.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from smalltts_tpu.parallel.mesh import make_mesh


def initialize_from_env() -> dict:
    """Join the distributed job described by SMALLTTS_* env vars.

    Returns a summary dict (coordinator, process_id, counts). No-ops with a
    single-process summary when the env vars are absent, so the same
    training entry point runs unchanged on one host.
    """
    coord = os.environ.get("SMALLTTS_COORDINATOR")
    if coord is None:
        # Cloud TPU pod path (the docstring's "auto-discovers with no
        # arguments"): when the runtime's own pod env vars are present,
        # argless initialize() resolves coordinator/rank itself. Without
        # this call every pod host would see only LOCAL devices and run N
        # independent jobs racing each other's checkpoints (review r3).
        # careful markers: single-host TPU runtimes also set
        # TPU_WORKER_HOSTNAMES (to one host), so require MULTIPLE workers
        # or an explicit multislice coordinator
        multi_worker = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") or multi_worker:
            jax.distributed.initialize()
            return {
                "distributed": True,
                "coordinator": "auto (Cloud TPU pod env)",
                "process_id": jax.process_index(),
                "num_processes": jax.process_count(),
                "local_devices": len(jax.local_devices()),
                "global_devices": len(jax.devices()),
            }
        return {
            "distributed": False,
            "process_id": 0,
            "num_processes": 1,
            "note": "SMALLTTS_COORDINATOR unset: single-process",
        }
    try:
        num = int(os.environ["SMALLTTS_NUM_PROCESSES"])
        pid = int(os.environ["SMALLTTS_PROCESS_ID"])
    except (KeyError, ValueError) as exc:  # missing OR malformed (e.g. '')
        raise RuntimeError(
            "SMALLTTS_COORDINATOR is set but SMALLTTS_NUM_PROCESSES / "
            "SMALLTTS_PROCESS_ID are missing or not integers — all three "
            "are required to join a distributed job "
            "(see parallel/multihost.py)") from exc
    # local_device_ids: optional comma list (e.g. when several processes
    # share one host and must split its devices)
    local_ids = os.environ.get("SMALLTTS_LOCAL_DEVICE_IDS")
    kwargs = {}
    if local_ids:
        kwargs["local_device_ids"] = [int(x) for x in local_ids.split(",")]
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=num, process_id=pid, **kwargs
    )
    return {
        "distributed": True,
        "coordinator": coord,
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_coordinator() -> bool:
    return jax.process_index() == 0


def global_mesh(dp: Optional[int] = None, tp: int = 1):
    """Mesh over the GLOBAL device set (all processes). dp defaults to
    n_global/tp. tp axes should stay within one host/slice (ICI); dp is the
    axis that crosses hosts (DCN) — the order of jax.devices() groups
    process-local devices together, and make_mesh's (dp, tp) reshape keeps
    each tp group within one process when tp <= local device count."""
    return make_mesh(dp=dp, tp=tp, devices=jax.devices())


def local_batch_to_global(batch: dict, mesh) -> dict:
    """Per-process local batch shards -> one global dp-sharded batch.

    Each process passes its OWN slice of the global batch (local_batch_size
    = global_batch_size / num_processes). Alias of mesh.shard_batch, which
    is process-count aware — one data path for single- and multi-host."""
    from smalltts_tpu.parallel.mesh import shard_batch

    return shard_batch(batch, mesh)


def fetch_replicated(tree):
    """Device arrays -> host numpy, gathering non-addressable shards.

    Replicated (and dp-only-sharded) params are fully addressable on every
    process and fetch directly; tp-sharded params spanning processes go
    through an allgather so the coordinator holds complete tensors."""
    import numpy as np

    def fetch(x):
        if not hasattr(x, "is_fully_addressable"):
            return np.asarray(x)
        if x.is_fully_addressable:
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree.map(fetch, tree)


def save_on_coordinator(path: str, tree) -> bool:
    """Single-writer checkpoint: process 0 writes, everyone else returns.

    All processes participate in the gather (a collective) BEFORE the
    writer check, so tp-sharded state never deadlocks."""
    host_tree = fetch_replicated(tree)
    if not is_coordinator():
        return False
    from smalltts_tpu.utils.checkpoint import save_pytree

    save_pytree(path, host_tree)
    return True


def auto_mesh(dp: int = 0, tp: int = 1):
    """Trainer-CLI helper: one call that covers every launch mode.

    * SMALLTTS_COORDINATOR set -> join the distributed job, return a mesh
      over the GLOBAL device set (the `accelerate launch` equivalent);
    * --dp > 1 -> local mesh over this host's devices;
    * otherwise -> None (single device).
    """
    info = initialize_from_env()
    if info["distributed"]:
        # an explicit --dp is honored as the GLOBAL dp ways; a value that
        # doesn't cover the device grid fails loudly in make_mesh rather
        # than being silently replaced
        mesh = global_mesh(dp=dp if dp and dp > 1 else None, tp=tp)
        if is_coordinator():
            print(f"distributed: {info['num_processes']} processes, "
                  f"{info['global_devices']} global devices, mesh "
                  f"dp={mesh.shape['dp']} tp={mesh.shape['tp']}")
        return mesh
    if (dp and dp > 1) or tp > 1:
        # tp > 1 alone must not be silently ignored: dp=None lets make_mesh
        # derive dp = n_local / tp
        return make_mesh(dp=dp if dp and dp > 1 else None, tp=tp)
    return None


def barrier(name: str = "smalltts") -> None:
    """Cross-process sync point (e.g. 'checkpoint written, all may read')."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
