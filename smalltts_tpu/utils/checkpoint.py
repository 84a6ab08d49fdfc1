"""Pytree checkpointing: flat-key .npz (portable) + torch-checkpoint loading.

Parity with the reference's checkpoint story (reference:
src/scripts/train/teacher.py:160-171, distill.py:465-479,
test_checkpoint.py:13-27): portable weight files + tolerant key cleaning.
Our native format is a flat `a/b/c`-keyed npz — dependency-free, memory-maps,
and round-trips exactly.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np

_SEP = "/"
_LIST = "#"  # list index marker: blocks#3/attn/...


def flatten_pytree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{path}{_SEP}{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{path}{_LIST}{i}")
        else:
            out[path] = np.asarray(node)

    rec(tree, prefix)
    return out


def unflatten_pytree(flat: Dict[str, np.ndarray]) -> Any:
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = root
        for i, part in enumerate(parts):
            last = i == len(parts) - 1
            if _LIST in part:
                name, idx = part.split(_LIST)
                idx = int(idx)
                lst = node.setdefault(name, [])
                while len(lst) <= idx:
                    lst.append({})
                if last:
                    lst[idx] = val
                else:
                    node = lst[idx]
            else:
                if last:
                    node[part] = val
                else:
                    node = node.setdefault(part, {})
    return root


# npz index entry naming the leaves stored as uint16 views of bfloat16:
# np.savez writes ml_dtypes.bfloat16 arrays as raw void '|V2' with no error,
# silently breaking the round-trip (review r3) — bf16 is the serving dtype,
# so it must survive checkpointing exactly
_BF16_KEY = "__bfloat16_keys__"

# npz key carrying the checkpoint's JSON metadata (architecture config,
# utils/config_io). Reserved: load_pytree strips it, so old readers that
# predate it and new readers of old meta-free files both work unchanged.
_META_KEY = "__meta_json__"


def _atomic_savez(path: str, arrays: Dict[str, np.ndarray]) -> None:
    """Write-to-temp + rename so a crash mid-save never corrupts the last
    good checkpoint (np.savez appends .npz to paths without the suffix, so
    the temp name keeps it). bfloat16 leaves are stored as uint16 views and
    recorded in the _BF16_KEY index; other non-native dtypes raise loudly
    instead of degrading to void bytes."""
    import ml_dtypes

    out: Dict[str, np.ndarray] = {}
    bf16_keys = []
    for k, v in arrays.items():
        v = np.asarray(v)
        if v.dtype.kind == "V":
            if v.dtype == ml_dtypes.bfloat16:
                bf16_keys.append(k)
                v = v.view(np.uint16)
            else:
                raise ValueError(
                    f"cannot serialize leaf {k!r} of dtype {v.dtype} to npz")
        out[k] = v
    if bf16_keys:
        out[_BF16_KEY] = np.array(bf16_keys)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **out)
    os.replace(tmp, path)


def _decode_npz(data) -> Dict[str, np.ndarray]:
    """Inverse of _atomic_savez's dtype handling."""
    bf16 = set()
    if _BF16_KEY in data.files:
        bf16 = {str(x) for x in data[_BF16_KEY]}
    out: Dict[str, np.ndarray] = {}
    for k in data.files:
        if k == _BF16_KEY:
            continue
        v = data[k]
        if k in bf16:
            import ml_dtypes

            v = v.view(ml_dtypes.bfloat16)
        out[k] = v
    return out


def save_pytree(path: str, tree, meta: "dict | None" = None) -> None:
    """`meta` (JSON-safe dict, e.g. config_io.backbone_meta(cfg)) rides in
    the npz under a reserved key so a checkpoint knows its own architecture
    (the reference's .pt files don't — src/scripts/test_checkpoint.py exists
    to debug the resulting shape mismatches)."""
    import json

    flat = flatten_pytree(jax.device_get(tree))
    if meta is not None:
        if _META_KEY in flat:
            raise ValueError(f"pytree already contains reserved key {_META_KEY!r}")
        flat[_META_KEY] = np.array(json.dumps(meta))
    _atomic_savez(path, flat)


def load_meta(path: str) -> "dict | None":
    """Metadata dict embedded by save_pytree(meta=...), or None for
    old-format / meta-free checkpoints."""
    import json

    with np.load(path, allow_pickle=False) as data:
        if _META_KEY not in data.files:
            return None
        return json.loads(str(data[_META_KEY]))


def load_pytree(path: str):
    with np.load(path, allow_pickle=False) as data:
        flat = _decode_npz(data)
    flat.pop(_META_KEY, None)  # reserved metadata key never leaks into the tree
    return unflatten_pytree(flat)


def load_reference_backbone_checkpoint(path: str):
    """Load a reference torch teacher/DMD checkpoint into our pytree.

    Accepts raw state_dicts, `{"model": ...}` wrappers and the DMD bundle
    (`student_model` key preferred, distill.py:468-479)."""
    import torch

    from smalltts_tpu.utils.torch_convert import (
        convert_backbone_state_dict,
        state_dict_to_numpy,
    )

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict):
        for key in ("student_model", "model"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    return convert_backbone_state_dict(state_dict_to_numpy(ckpt))


def save_train_state(path: str, state) -> None:
    """Full trainer-state checkpoint (params + optimizer + EMA + step) — the
    equivalent of the reference's accelerator.save_state
    (reference: teacher.py:91-93, distill.py:213-219).

    optax states are NamedTuples whose structure can't round-trip a generic
    npz; leaves are stored in tree order and restored into a freshly-built
    template (load_train_state)."""
    leaves = jax.tree.leaves(jax.device_get(state))
    _atomic_savez(path, {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)})


def load_train_state(path: str, template):
    """Restore a save_train_state checkpoint into `template`'s structure."""
    treedef = jax.tree.structure(template)
    with np.load(path, allow_pickle=False) as data:
        flat = _decode_npz(data)
    leaves = [flat[k] for k in sorted(flat)]
    t_leaves = jax.tree.leaves(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template expects {len(t_leaves)}"
        )
    import jax.numpy as jnp

    leaves = [
        jnp.asarray(l, dtype=t.dtype) if hasattr(t, "dtype") else l
        for l, t in zip(leaves, t_leaves)
    ]
    return jax.tree.unflatten(treedef, leaves)


class AsyncCheckpointer:
    """Overlap checkpoint I/O with training.

    The reference's accelerator.save_state blocks the step loop while ~4 GB
    of trainer state serializes (teacher.py:160-171); here the training
    thread only snapshots array references (cheap — jax arrays are
    immutable), and device->host transfer + npz serialization + atomic
    rename run on one background worker. `wait()` joins outstanding saves;
    a bounded queue applies backpressure if saves can't keep up with
    save_every."""

    def __init__(self, max_pending: int = 2) -> None:
        import queue
        import threading

        self._q = queue.Queue(maxsize=max_pending)
        self._errors: list = []
        self._closed = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args = item
            try:
                fn(*args)
            except Exception as exc:  # surfaced on wait()
                self._errors.append(exc)
            finally:
                self._q.task_done()

    @staticmethod
    def _snapshot(tree):
        """On-device copy: training steps donate their input buffers, so by
        the time the worker serializes, the original arrays may be deleted.
        A device-side copy is an HBM-bandwidth memcpy (fast, async dispatch)
        and is never donated."""
        import jax.numpy as jnp

        return jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, tree
        )

    def _enqueue(self, fn, args) -> None:
        # a save after close() would sit unprocessed forever (silent
        # checkpoint loss) and deadlock the next wait() in Queue.join()
        # — the worker is gone, nothing calls task_done (review r3)
        if self._closed:
            raise RuntimeError("AsyncCheckpointer is closed")
        self._q.put((fn, args))

    def save_pytree(self, path: str, tree, meta: "dict | None" = None) -> None:
        self._enqueue(save_pytree, (path, self._snapshot(tree), meta))

    def save_train_state(self, path: str, state) -> None:
        self._enqueue(save_train_state, (path, self._snapshot(state)))

    def wait(self) -> None:
        """Block until all queued saves hit disk; re-raise the first error
        recorded SINCE the last wait (errors are consumed — a trainer that
        catches a transient failure and retries gets a clean wait after a
        later successful save; review r3)."""
        self._q.join()
        if self._errors:
            errors, self._errors = self._errors, []
            raise errors[0]

    def close(self) -> None:
        """Flush and shut the worker down — ALWAYS, even when the flush
        re-raises a save error (the sentinel must reach the worker or the
        thread leaks and the final join never completes; review r3)."""
        self._closed = True
        try:
            self.wait()
        finally:
            self._q.put(None)
            self._thread.join(timeout=10)


def cast_floating(tree, dtype):
    """Cast floating leaves to `dtype` (e.g. bf16 for TPU inference)."""
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree.map(cast, tree)
