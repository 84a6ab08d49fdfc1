"""Multi-host layer (parallel/multihost.py).

Fast tests cover the single-process degradation paths (the same entry
points must run unchanged on one host); the full two-process dryrun —
jax.distributed.initialize, a process-spanning dp mesh, cross-process
gradient psum, single-writer checkpointing — runs the real subprocess
harness under RUN_SLOW (scripts/dryrun_multihost.py, ~2 min on 1 CPU)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_initialize_from_env_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("SMALLTTS_COORDINATOR", raising=False)
    from smalltts_tpu.parallel.multihost import initialize_from_env, is_coordinator

    info = initialize_from_env()
    assert info["distributed"] is False
    assert info["num_processes"] == 1
    assert is_coordinator()


def test_local_batch_to_global_single_process():
    """With one process the helper is plain device_put with dp sharding —
    the multi-host data path and the single-host one are the same code."""
    from smalltts_tpu.parallel.mesh import make_mesh
    from smalltts_tpu.parallel.multihost import local_batch_to_global

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(dp=4, tp=2)
    batch = {"latents": np.arange(4 * 3 * 2, dtype=np.float32).reshape(4, 3, 2),
             "lengths": np.array([3, 3, 3, 3], np.int32),
             "texts": ["dropped"]}
    out = local_batch_to_global(batch, mesh)
    assert "texts" not in out
    np.testing.assert_array_equal(np.asarray(out["latents"]), batch["latents"])
    assert "dp" in str(out["latents"].sharding.spec)


def test_save_on_coordinator_single_process(tmp_path):
    from smalltts_tpu.parallel.multihost import save_on_coordinator
    from smalltts_tpu.utils.checkpoint import load_pytree

    tree = {"a": np.ones((3, 2), np.float32), "b": {"c": np.zeros(4)}}
    path = str(tmp_path / "ck.npz")
    assert save_on_coordinator(path, tree) is True
    loaded = load_pytree(path)
    np.testing.assert_array_equal(loaded["a"], tree["a"])


def test_fetch_replicated_gathers_sharded_arrays():
    """tp-sharded arrays come back as complete host tensors (the gather
    path save_on_coordinator relies on)."""
    from smalltts_tpu.parallel.mesh import make_mesh
    from smalltts_tpu.parallel.multihost import fetch_replicated

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(dp=2, tp=4)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sharded = jax.device_put(x, NamedSharding(mesh, P(None, "tp")))
    out = fetch_replicated({"w": sharded})
    np.testing.assert_array_equal(out["w"], x)


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="two-process distributed dryrun (~2 min); RUN_SLOW=1")
def test_dryrun_multihost_end_to_end():
    """The real thing: 2 processes x 2 CPU devices; phase 1 dp=4 across the
    process boundary, phase 2 dp=2 x tp=2 (tp groups process-local, the ICI
    story; the reference has no TP anywhere) — both replica-consistent and
    equal to the single-process anchor, single-writer checkpoints, and the
    tp-sharded EMA checkpoint allgathered back to full tensor shapes."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("SMALLTTS_", "XLA_FLAGS", "JAX_PLATFORMS"))}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:] + proc.stdout[-1000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"] is True
    assert result["rel_diff_tp1"] < 2e-4
    assert result["rel_diff_tp2"] < 2e-4
    assert result["tp_ckpt_leaves"] > 0


def test_pod_env_triggers_argless_initialize(monkeypatch):
    """The docstring's Cloud-TPU-pod path must actually CALL
    jax.distributed.initialize() when pod env vars are present (review r3:
    it silently fell back to single-process, running N independent jobs on
    a pod that race each other's checkpoints)."""
    from smalltts_tpu.parallel import multihost

    monkeypatch.delenv("SMALLTTS_COORDINATOR", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    calls = []

    def fake_init(*a, **kw):
        calls.append((a, kw))

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    info = multihost.initialize_from_env()
    assert calls == [((), {})], "argless jax.distributed.initialize expected"
    assert info["distributed"] is True
    assert info["coordinator"].startswith("auto")
