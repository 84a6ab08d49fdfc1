"""Checkpoint round-trip + tolerant key cleaning."""

import numpy as np

import jax

from tiny import TINY_BACKBONE
from smalltts_tpu.models.backbone import init_backbone
from smalltts_tpu.utils.checkpoint import (
    flatten_pytree,
    load_pytree,
    save_pytree,
    unflatten_pytree,
)
from smalltts_tpu.utils.torch_convert import clean_state_dict_keys


def test_flatten_unflatten_roundtrip():
    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    flat = flatten_pytree(params)
    rebuilt = unflatten_pytree(flat)
    orig_leaves = jax.tree.leaves(params)
    new_leaves = jax.tree.leaves(rebuilt)
    assert len(orig_leaves) == len(new_leaves)
    for a, b in zip(orig_leaves, new_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_load_roundtrip(tmp_path):
    params = init_backbone(jax.random.PRNGKey(1), TINY_BACKBONE)
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, params)
    loaded = load_pytree(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_roundtrip(tmp_path):
    """Full trainer state (params + optax state + EMA + step) round-trips."""
    import jax.numpy as jnp

    from smalltts_tpu.train.ema import ema_init
    from smalltts_tpu.train.optim import adamw
    from smalltts_tpu.utils.checkpoint import load_train_state, save_train_state

    params = init_backbone(jax.random.PRNGKey(2), TINY_BACKBONE)
    tx = adamw(params, 1e-4)
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "ema": ema_init(params),
        "step": jnp.asarray(123, jnp.int32),
    }
    path = str(tmp_path / "train_state.npz")
    save_train_state(path, state)

    template = {
        "params": init_backbone(jax.random.PRNGKey(99), TINY_BACKBONE),
        "opt_state": tx.init(params),
        "ema": ema_init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    restored = load_train_state(path, template)
    assert int(restored["step"]) == 123
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_clean_state_dict_keys():
    """Prefix-cleaning parity (reference: distill.py:39-57)."""
    sd = {
        "module._orig_mod.dit.foo": 1,
        "ema_model.velocity.weight": 2,
        "online_model.x": 3,
        "initted": 99,
        "step": 99,
        "a._orig_mod.b": 4,
    }
    out = clean_state_dict_keys(sd)
    assert out == {"dit.foo": 1, "velocity.weight": 2, "x": 3, "a.b": 4}


def test_async_checkpointer_roundtrip(tmp_path):
    import jax.numpy as jnp

    from smalltts_tpu.utils.checkpoint import (
        AsyncCheckpointer,
        load_pytree,
        load_train_state,
    )

    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    state = {"params": tree, "step": jnp.asarray(7)}
    saver = AsyncCheckpointer()
    for i in range(3):  # overlapping saves to the same path serialize
        saver.save_pytree(str(tmp_path / "p.npz"), tree)
    saver.save_train_state(str(tmp_path / "s.npz"), state)
    saver.close()
    import numpy as np

    got = load_pytree(str(tmp_path / "p.npz"))
    np.testing.assert_array_equal(got["a"], np.arange(6.0).reshape(2, 3))
    restored = load_train_state(str(tmp_path / "s.npz"), state)
    assert int(restored["step"]) == 7
    # atomicity: no temp files left behind
    assert not [f for f in tmp_path.iterdir() if ".tmp" in f.name]


def test_async_checkpointer_surfaces_errors(tmp_path):
    import jax.numpy as jnp
    import pytest

    from smalltts_tpu.utils.checkpoint import AsyncCheckpointer

    saver = AsyncCheckpointer()
    saver.save_pytree("/proc/definitely/not/writable/x.npz", {"a": jnp.ones(2)})
    with pytest.raises(Exception):
        saver.wait()


def test_async_checkpointer_errors_clear_and_close_shuts_down(tmp_path):
    """wait() consumes recorded errors (a retried save must get a clean
    wait later), and close() delivers the shutdown sentinel even when the
    flush re-raises (review r3: a stale error poisoned every later wait,
    and close() leaked the worker thread)."""
    import pytest

    from smalltts_tpu.utils.checkpoint import AsyncCheckpointer

    saver = AsyncCheckpointer()
    # a path UNDER an existing file: os.makedirs fails (save_pytree
    # auto-creates missing directories, so a merely-absent dir won't)
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    bad_dir = blocker / "nested"
    saver.save_pytree(str(bad_dir / "x.npz"), {"a": np.zeros(2)})
    with pytest.raises(Exception):
        saver.wait()
    # error consumed: a later good save yields a clean wait
    good = tmp_path / "ok.npz"
    saver.save_pytree(str(good), {"a": np.ones(3)})
    saver.wait()
    assert good.exists()
    # close() after a failure still shuts the worker down
    saver.save_pytree(str(blocker / "deep" / "y.npz"), {"a": np.zeros(1)})
    with pytest.raises(Exception):
        saver.close()
    assert not saver._thread.is_alive() or saver._q.qsize() == 0
    saver._thread.join(timeout=5)
    assert not saver._thread.is_alive()


def test_bfloat16_pytree_roundtrips_exactly(tmp_path):
    """np.savez stores ml_dtypes.bfloat16 as raw void '|V2' with no error —
    the serving dtype must survive checkpointing (review r3)."""
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np

    from smalltts_tpu.utils.checkpoint import load_pytree, save_pytree

    tree = {"w": jnp.arange(8, dtype=jnp.bfloat16) / 3,
            "nested": {"b": jnp.ones((2, 3), jnp.bfloat16) * 1.5,
                       "f32": jnp.ones((2,), jnp.float32)}}
    path = str(tmp_path / "bf16.npz")
    save_pytree(path, tree)
    back = load_pytree(path)
    assert back["w"].dtype == ml_dtypes.bfloat16
    assert back["nested"]["b"].dtype == ml_dtypes.bfloat16
    assert back["nested"]["f32"].dtype == np.float32
    np.testing.assert_array_equal(np.asarray(tree["w"]), back["w"])
    np.testing.assert_array_equal(np.asarray(tree["nested"]["b"]),
                                  back["nested"]["b"])


def test_bfloat16_train_state_roundtrips(tmp_path):
    import jax.numpy as jnp
    import numpy as np

    from smalltts_tpu.utils.checkpoint import load_train_state, save_train_state

    state = {"p": jnp.full((4,), 0.125, jnp.bfloat16), "step": jnp.int32(7)}
    path = str(tmp_path / "ts.npz")
    save_train_state(path, state)
    back = load_train_state(path, state)
    assert back["p"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(state["p"]), np.asarray(back["p"]))
    assert int(back["step"]) == 7


def test_async_checkpointer_rejects_saves_after_close(tmp_path):
    """A save enqueued after close() would sit unprocessed (silent loss) and
    deadlock the next wait() in Queue.join() (review r3)."""
    import jax.numpy as jnp
    import pytest

    from smalltts_tpu.utils.checkpoint import AsyncCheckpointer

    saver = AsyncCheckpointer()
    saver.save_pytree(str(tmp_path / "a.npz"), {"x": jnp.ones(2)})
    saver.close()
    with pytest.raises(RuntimeError, match="closed"):
        saver.save_pytree(str(tmp_path / "b.npz"), {"x": jnp.ones(2)})
