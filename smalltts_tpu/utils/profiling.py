"""Tracing / profiling / metrics.

Replaces the reference's observability story (SURVEY.md section 5: Rust
`tracing` + per-stage Timing structs + accelerator.log no-op) with:

* `trace(dir)` — capture a jax.profiler trace viewable in TensorBoard/xprof;
* `annotate(name)` — named region inside a trace (TraceAnnotation);
* `MetricsLogger` — JSONL metrics file + stdout, the functional equivalent of
  `accelerator.log(dict, step)` (reference: teacher.py:154-158,
  distill.py:453-463) that actually persists without a tracker configured.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/smalltts_trace") -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Accumulates named wall-clock stages (pipeline Timing generalized)."""

    def __init__(self) -> None:
        self.stages: Dict[str, float] = {}
        self._t = time.perf_counter()

    def mark(self, name: str) -> float:
        now = time.perf_counter()
        ms = (now - self._t) * 1e3
        self.stages[name] = self.stages.get(name, 0.0) + ms
        self._t = now
        return ms

    @property
    def total_ms(self) -> float:
        return sum(self.stages.values())


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True) -> None:
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, metrics: Dict[str, float], step: int) -> None:
        record = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        if self._f:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()
        if self.echo:
            body = " ".join(f"{k}={v:.5g}" for k, v in record.items() if k != "step")
            print(f"step {step}: {body}")

    def close(self) -> None:
        if self._f:
            self._f.close()
