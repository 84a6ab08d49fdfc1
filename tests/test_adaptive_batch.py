"""Adaptive serving batch (VERDICT r3 weak #4).

The fixed max_batch=8 default left a measured 2.9x audio-s/s at depth on
the table (PERF.md: batch 32 -> 1,861 vs 635 audio-s/s on v5e-1). The
batcher now carries a ladder of batch classes and a controller that grows
the active class under sustained queue depth, shrinks it when the queue
drains, and steps down immediately on a p95 sojourn SLO breach.

These tests pin the POLICY on fake pipelines (real throughput is a TPU
measurement, recorded by scripts/bench_serving.py / PERF.md).
"""

import threading
import time

import numpy as np

from smalltts_tpu.serving.batcher import (
    Batcher,
    Request,
    batch_ladder,
    group_requests,
    pad_group,
)


def test_batch_ladder():
    assert batch_ladder(8, 32) == [8, 32]
    assert batch_ladder(8, 64) == [8, 32, 64]
    assert batch_ladder(8, None) == [8]
    assert batch_ladder(8, 0) == [8]
    assert batch_ladder(8, 8) == [8]
    assert batch_ladder(8, 20) == [8, 20]  # clamps at the limit


def _reqs(n, dur=1.0):
    return [Request(np.zeros((4, 64), np.float32), [1, 2], dur)
            for _ in range(n)]


def test_group_requests_greedy_class_chop():
    """40 same-bucket requests at classes [8, 32] -> one full 32 + one 8,
    not 32 + a 75%-padded group."""
    groups = group_requests(_reqs(40), 32, classes=[8, 32])
    assert sorted(len(g) for g in groups) == [8, 32]

    # 12 deep: a full 8 plus a remainder-4 (padded to 8 downstream), never
    # a 12-of-32 at 37% fill
    groups = group_requests(_reqs(12), 32, classes=[8, 32])
    assert sorted(len(g) for g in groups) == [4, 8]


def test_pad_group_smallest_covering_class():
    g = _reqs(5)
    *_, b_bucket = pad_group(g, 32, classes=[8, 32])
    assert b_bucket == 8  # NOT 32: padded slots are wasted MXU work
    *_, b_bucket = pad_group(_reqs(20), 32, classes=[8, 32])
    assert b_bucket == 32
    *_, b_bucket = pad_group(_reqs(1), 32, classes=[8, 32])
    assert b_bucket == 1


class _Recorder:
    """Fake pipeline recording dispatched batch shapes; optional delay
    keeps the queue deep so the controller sees sustained depth."""

    def __init__(self, delay_s=0.0):
        self.batches = []
        self.delay_s = delay_s
        self.lock = threading.Lock()

    def synthesize_padded(self, ref, ref_lens, ph, ph_lens, seq_lens,
                          t_bucket, key=None, fetch=True):
        with self.lock:
            self.batches.append(ref.shape[0])
        if self.delay_s:
            time.sleep(self.delay_s)
        return np.zeros((ref.shape[0], 1, int(t_bucket) * 3200), np.float32)


def test_class_grows_under_sustained_depth():
    """A deep sustained queue must escalate the batch class to 32 and
    dispatch full-32 groups."""
    tts = _Recorder(delay_s=0.02)
    b = Batcher(tts, max_batch=8, window_ms=1.0, growth_limit=32,
                max_queue=1024)
    try:
        futs = [b.submit(np.zeros((4, 64), np.float32), [1, 2], 1.0)
                for _ in range(200)]
        for f in futs:
            f.result(timeout=60)
    finally:
        b.close()
    assert 32 in tts.batches, f"never grew to 32: {sorted(set(tts.batches))}"


def test_class_shrinks_when_queue_drains():
    """After the burst ends, trickling singles must walk the class back to
    the base so latency-sensitive traffic stops paying batch-32 padding."""
    tts = _Recorder(delay_s=0.01)
    b = Batcher(tts, max_batch=8, window_ms=1.0, growth_limit=32,
                max_queue=1024)
    try:
        futs = [b.submit(np.zeros((4, 64), np.float32), [1, 2], 1.0)
                for _ in range(200)]
        for f in futs:
            f.result(timeout=60)
        assert b.batch_class == 32  # escalated during the burst
        for _ in range(12):  # trickle: depth <= previous class every tick
            b.submit(np.zeros((4, 64), np.float32), [1, 2], 1.0).result(
                timeout=30)
        assert b.batch_class == 8, b.batch_class
    finally:
        b.close()


def test_slo_breach_steps_class_down():
    """p95 sojourn over the SLO forces an immediate step-down (policy
    unit: state is driven directly — sojourn timing on real hardware is a
    bench measurement, not a unit test)."""
    b = Batcher(_Recorder(), max_batch=8, window_ms=1.0, growth_limit=32,
                latency_slo_ms=100.0)
    try:
        b._cls_idx = 1  # as if grown to 32
        b._sojourn_ms.extend([500.0] * 16)  # all far over the 100 ms SLO
        b._adapt(depth=64)  # depth says grow; the SLO guard must win
        assert b.batch_class == 8
        assert len(b._sojourn_ms) == 0  # cooldown: re-measure at new class
    finally:
        b.close()


def test_adaptivity_disabled_is_pinned():
    b = Batcher(_Recorder(), max_batch=8, window_ms=1.0)  # no growth_limit
    try:
        assert b.batch_class == 8
        b._adapt(depth=10_000)
        assert b.batch_class == 8
    finally:
        b.close()
