"""Utilities: profiling, throughput metrics, structured logging, debugging.

The reference has NO observability beyond print/tqdm (SURVEY §5: tensorboard
listed-but-unused, no timing anywhere). This subsystem adds the TPU-native
equivalents: jax.profiler trace capture, throughput counters, NaN guards."""

from .profiling import (  # noqa: F401
    ThroughputMeter,
    profile_trace,
    block_and_time,
)
from .debugging import check_finite, param_count  # noqa: F401


def parse_hu_window(s):
    """CLI 'lo,hi' -> (lo, hi) floats; None/'' -> None.

    Single source of truth for every entry point's --hu-window flag (the
    value must match between training ingest and any later scoring)."""
    return tuple(float(x) for x in s.split(",")) if s else None
