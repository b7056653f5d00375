"""Profiling + throughput instrumentation (SURVEY §5 tracing row)."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (open with TensorBoard / xprof) around a
    code block. Usage:

        with profile_trace("/tmp/trace"):
            run_epoch(...)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(result):
    """True device-completion barrier.

    jax.block_until_ready is NOT reliable on the axon remote backend — it
    returns before the computation finishes (measured: "block" in 8.6 ms,
    then the value fetch stalled 47 s draining the queue). Fetching one
    element of one leaf is a real barrier, and device execution is in-order,
    so it fences every dispatch queued before it."""
    import jax
    import numpy as np

    leaves = [x for x in jax.tree_util.tree_leaves(result)
              if hasattr(x, "shape")]
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[-1])[:1])
    return result


def block_and_time(fn, *args, iters: int = 1, **kwargs):
    """(mean_seconds, last_result) with device completion included."""
    result = _sync(fn(*args, **kwargs))  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    _sync(result)
    return (time.perf_counter() - t0) / iters, result


@dataclass
class ThroughputMeter:
    """Steps/sec + items/sec counter for training loops.

    The driver-set north-star metrics are steps/sec and CT vols/sec
    (BASELINE.json); this is the shared counter behind them."""

    name: str = "train"
    _t0: float = field(default_factory=time.perf_counter)
    steps: int = 0
    items: int = 0

    def update(self, n_items: int = 0):
        self.steps += 1
        self.items += n_items

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def steps_per_sec(self) -> float:
        return self.steps / max(self.elapsed, 1e-9)

    @property
    def items_per_sec(self) -> float:
        return self.items / max(self.elapsed, 1e-9)

    def summary(self) -> dict:
        return {
            "name": self.name,
            "steps": self.steps,
            "items": self.items,
            "elapsed_sec": round(self.elapsed, 3),
            "steps_per_sec": round(self.steps_per_sec, 3),
            "items_per_sec": round(self.items_per_sec, 3),
        }

    def reset(self):
        self._t0 = time.perf_counter()
        self.steps = 0
        self.items = 0
