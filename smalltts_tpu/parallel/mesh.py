"""Device mesh + sharding rules: the distributed layer of the framework.

The reference delegates ALL parallelism to HF Accelerate (DDP over NCCL,
reference: src/scripts/train/teacher.py:49,81-83, SURVEY.md section 2.6).
Here parallelism is first-class and XLA-compiled over ICI:

* data parallel   — batch axis sharded over mesh axis "dp"; gradient psums
                    inserted by XLA because params are replicated across dp;
* tensor parallel — attention heads / FF hidden dims sharded over mesh axis
                    "tp" (useful headroom for bigger models; the 328M default
                    fits one chip but the mechanism is exercised end-to-end
                    and validated on a virtual 8-device CPU mesh in tests).

Rules are shape/path-driven: a leaf is sharded on an axis only when the dim
is divisible by the axis size, otherwise replicated — so any tp in {1,2,4,8}
works on every submodule without special cases.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


# (substring, which dim of the *matmul* to shard): "out" = last axis, "in" =
# second-to-last. Order matters — first match wins.
_TP_RULES = [
    ("attn/to_out/w", "in"),
    ("attn/wo/w", "in"),
    ("mlp/w2/w", "in"),
    ("ff/w2/w", "in"),
    ("attn/qkv_self", "out"),
    ("attn/qkvg", "out"),
    ("ff/w13", "out"),
    ("attn/kv_ref", "out"),
    ("attn/kv_text", "out"),
    ("attn/gate", "out"),
    ("attn/wq", "out"),
    ("attn/wk", "out"),
    ("attn/wv", "out"),
    ("mlp/w1", "out"),
    ("mlp/w3", "out"),
    ("ff/w1", "out"),
    ("ff/w3", "out"),
]


def _leaf_spec(path: str, leaf, tp_size: int) -> P:
    shape = np.shape(leaf)
    if tp_size == 1 or len(shape) == 0:
        return P()
    for pattern, which in _TP_RULES:
        if pattern in path:
            axis = len(shape) - 1 if which == "out" else max(len(shape) - 2, 0)
            if shape[axis] % tp_size == 0:
                spec = [None] * len(shape)
                spec[axis] = "tp"
                return P(*spec)
            return P()
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings: tp-sharded projections, replicated rest."""
    tp_size = mesh.shape["tp"]

    def rule(path, leaf):
        return NamedSharding(mesh, _leaf_spec(_path_str(path), leaf, tp_size))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch axis over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Host batch -> dp-sharded device batch.

    Multi-process aware: under a process-spanning mesh (jax.distributed),
    each process passes its LOCAL slice of the global batch (local_bs =
    global_bs / process_count) and receives the global array view — the
    same call sites work single-host and multi-host (see
    parallel/multihost.py and scripts/dryrun_multihost.py)."""
    multiprocess = jax.process_count() > 1

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            sharding = data_sharding(mesh, x.ndim)
            if multiprocess:
                return jax.make_array_from_process_local_data(sharding, x)
            return jax.device_put(x, sharding)
        return x

    return jax.tree.map(put, {k: v for k, v in batch.items() if k != "texts"})


def replicated(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
