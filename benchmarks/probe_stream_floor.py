#!/usr/bin/env python
"""Measured HBM streaming floor at the flagship step's byte footprint
(PERF.md round-5: turn "79% of speed-of-light is the honest ceiling" from
an inference into a measurement).

The bs=128 headline step moves 26.78 GB/step (cost_analysis, pinned) at
~648 GB/s effective — 79% of the v5e's 819 GB/s spec. Is the missing 21%
the program's fault, or simply what THIS chip achieves on THIS mix of
tensor sizes? This probe builds a synthetic scan program that does nothing
but stream a working set with (approximately) the flagship step's
tensor-size distribution — a multiply-add over each buffer, chained so XLA
cannot elide or fuse buffers together — and measures the achieved
effective bandwidth the same way the bench measures the real step
(value-fenced readback, K steps per dispatch).

The buffer mix defaults to the real program's profile (from
hlo_bytes_bs128.json's top rows the sizes cluster at ~120-470 MB trunk
fusions + a long tail of 1-60 MB activations): a few large buffers carry
most bytes, a tail of small ones carries kernel-launch/epilogue pressure.
The synthetic's cost_analysis-accounted bytes per scan step land close to
the real step's so the comparison is apples-to-apples.

Usage (real chip, idle host):
    python benchmarks/probe_stream_floor.py [--mb 384,192,128,64,24,8,2] \
        [--passes 12] [--steps 32] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mb", default="384,192,128,64,24,8,2",
                   help="working-set buffer sizes in MB (comma list)")
    p.add_argument("--passes", type=int, default=12,
                   help="multiply-add passes over the working set per step "
                        "(sets bytes/step = 2 x passes x sum(mb))")
    p.add_argument("--steps", type=int, default=32,
                   help="scan length per dispatch (amortizes tunnel cost)")
    p.add_argument("--iters", type=int, default=4,
                   help="timed dispatches")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    itemsize = 2 if args.dtype == "bf16" else 4
    sizes_mb = [float(s) for s in args.mb.split(",")]
    ns = [max(256, int(mb * 1e6 / itemsize)) for mb in sizes_mb]
    # pad each to a multiple of 1024 lanes so layouts stay friendly
    ns = [(n + 1023) // 1024 * 1024 for n in ns]
    ws_bytes = sum(n * itemsize for n in ns)
    # each pass reads + writes every buffer once
    step_bytes = 2 * args.passes * ws_bytes
    print(f"[stream-floor] working set {ws_bytes / 1e9:.3f} GB "
          f"({len(ns)} buffers), {args.passes} passes/step -> "
          f"{step_bytes / 1e9:.2f} GB/step modeled", file=sys.stderr)

    def step(bufs, c):
        # one multiply-add over every buffer per pass, with an
        # optimization_barrier between passes so each pass lowers to its
        # own fusion (one HBM read + one write per buffer per pass).
        # Earlier versions chained scalars/reductions between passes and
        # XLA still collapsed the chain — scalar-broadcast elementwise
        # chains stay pointwise-computable, so the compiler fused all
        # passes into ~one HBM pass (cost_analysis 0.9-1.0 GB/step vs the
        # intended 26.8; measured 2026-08-20). The barrier is the
        # guaranteed fence; cost_analysis below CONFIRMS the per-pass
        # traffic actually materialized.
        for _ in range(args.passes):
            bufs = [b * jnp.asarray(1.0001, b.dtype)
                    + jnp.asarray(1e-6, b.dtype) for b in bufs]
            bufs = list(jax.lax.optimization_barrier(tuple(bufs)))
        return bufs, c + bufs[0][0].astype(jnp.float32)

    def chunk(bufs, c):
        def body(carry, _):
            bufs, c = carry
            bufs, c = step(bufs, c)
            return (bufs, c), c

        (bufs, c), cs = jax.lax.scan(body, (bufs, c), None,
                                     length=args.steps)
        return bufs, cs.sum()

    rng = np.random.default_rng(0)
    bufs = [jnp.asarray(rng.normal(size=n).astype(np.float32), dtype)
            for n in ns]
    c0 = jnp.asarray(1.0, jnp.float32)

    jitted = jax.jit(chunk, donate_argnums=(0,))
    print("[stream-floor] compiling...", file=sys.stderr)
    lowered = jitted.lower(bufs, c0)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    # XLA counts the scan body ONCE (PERF.md round-3 note on the bench
    # chunk), so "bytes accessed" is already per scan STEP, not per
    # dispatch
    ca_bytes = float(ca.get("bytes accessed") or 0.0)
    print(f"[stream-floor] cost_analysis bytes/step {ca_bytes / 1e9:.2f} GB "
          f"(scan body counted once)", file=sys.stderr)

    # warm run + fence via value readback (axon: block_until_ready lies)
    out_bufs, s = compiled(bufs, c0)
    float(s)
    times = []
    for _ in range(args.iters):
        t0 = time.monotonic()
        out_bufs, s = compiled(out_bufs, c0)
        float(s)  # value readback fences the in-order queue
        times.append(time.monotonic() - t0)
    best = min(times)
    per_step = best / args.steps
    eff_model = step_bytes / per_step
    eff_ca = ca_bytes / per_step
    res = {
        "buffers_mb": sizes_mb, "passes": args.passes,
        "scan_steps": args.steps, "dtype": args.dtype,
        "working_set_gb": round(ws_bytes / 1e9, 3),
        "modeled_gb_per_step": round(step_bytes / 1e9, 3),
        "cost_analysis_gb_per_step": round(ca_bytes / 1e9, 3),
        "dispatch_seconds": [round(t, 4) for t in times],
        "ms_per_step": round(per_step * 1e3, 3),
        "effective_gb_s_modeled": round(eff_model / 1e9, 1),
        "effective_gb_s_cost_analysis": round(eff_ca / 1e9, 1),
        "pct_of_819_sol": round(100 * eff_model / 819e9, 1),
    }
    print(json.dumps(res, indent=2))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
