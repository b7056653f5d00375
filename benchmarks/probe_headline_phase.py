#!/usr/bin/env python
"""Break down the bench headline phase's wall-clock on the live tunnel.

Motivation (2026-08-19): with a WARM AOT cache the bs=128 headline phase
measured 308-480 s while its timed dispatches account for ~15 s and the
link probe showed 28-45 MB/s — something in the setup path (executable
load, batch upload, zeros-state upload, warmup) pays per-transfer round
trips far above the bulk-bandwidth cost. This probe installs
``bench._PHASE_MARK`` and calls the EXACT bench measurement function
(same program, same AOT cache entry — guaranteed hit when warm), printing
the wall-clock at each phase boundary. device_put is async on this
backend, so queued transfer time shows up at the warmup value fence; the
split between "program ready" and "warmup fenced" is therefore
(transfers + 2 chunk executions ≈ 6 s).

Run on the TPU with the machine otherwise idle:
    python benchmarks/probe_headline_phase.py [--batch 128]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    t0 = time.perf_counter()
    last = [t0]

    def mark(label):
        now = time.perf_counter()
        print(f"[probe] +{now - t0:7.1f}s (+{now - last[0]:6.1f}s) {label}",
              flush=True)
        last[0] = now

    import jax
    import jax.numpy as jnp

    mark(f"backend init done ({jax.default_backend()})")

    import bench

    bench._PHASE_MARK = mark
    batch = args.batch or bench.HEADLINE_BATCH
    mark(f"bench imported; starting measure_train_steps_per_sec "
         f"(bf16, folds=1, bs={batch})")
    steps, flops, src = bench.measure_train_steps_per_sec(
        dtype=jnp.bfloat16, folds=1, batch=batch)
    mark(f"timed dispatches done: {steps:.2f} steps/s "
         f"({flops} flops/step, {src})")


if __name__ == "__main__":
    main()
