"""Dataloader regressions (review r3): per-process decorrelation and
prefetch failure surfacing."""

import numpy as np
def test_dataloader_seeds_decorrelate_processes(monkeypatch):
    """Multi-host dp: every process must sample a different local slice —
    identical seeds made the global batch N duplicated copies (review r3).
    Single-process here, so simulate via jax.process_index monkeypatch."""
    import jax

    from smalltts_tpu.data.dummy import get_dummy_dataloader

    b0 = next(get_dummy_dataloader(2, seed=0))
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    b1 = next(get_dummy_dataloader(2, seed=0))
    assert not np.array_equal(b0["latents"], b1["latents"])


def test_local_loader_surfaces_producer_crash(tmp_path):
    """A crash in the prefetch thread must raise in the training loop, not
    leave it blocked forever on q.get() (review r3)."""
    import pytest

    from smalltts_tpu.data import local as local_mod
    from smalltts_tpu.data.local import get_local_dataloader

    class _BoomDS:
        def __init__(self, *a, **k):
            pass

        def sample_batch(self, rng):
            raise RuntimeError("boom in producer")

    real = local_mod.LocalDataset
    local_mod.LocalDataset = _BoomDS
    try:
        it = get_local_dataloader(str(tmp_path), encode_fn=None)
        with pytest.raises(RuntimeError, match="boom in producer"):
            next(it)
    finally:
        local_mod.LocalDataset = real
