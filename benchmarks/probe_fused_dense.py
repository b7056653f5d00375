#!/usr/bin/env python
"""Per-layer microbench: the fused Pallas BN->ReLU->1x1-conv stage
(ops/fused_dense.py) vs the plain-XLA oracle at real DenseNet layer shapes.

Isolates WHERE the full-model fused_bn1 result comes from (docs/PERF.md
round-4): each variant runs fwd+bwd (dx, dgamma, dbeta, dW) as a K-step
``lax.scan`` whose carry updates x and W from the gradients — so XLA cannot
hoist or CSE the work — and is timed value-fenced (CLAUDE.md: readback is
the only true fence on the axon backend).

Usage (idle host):
    python benchmarks/probe_fused_dense.py --shapes 262144x224,4096x992

Prints one JSON line per (shape, variant).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO_ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

K = 32


def probe(n, c, f=128, dtype="bfloat16", timed=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_survival_prediction_tpu.ops.fused_dense import (
        bn_relu_conv1x1_reference, fused_bn_relu_conv1x1)

    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(n, c))
    w_np = rng.normal(size=(c, f)) / np.sqrt(c)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)

    results = []
    for name, fn in (("fused", fused_bn_relu_conv1x1),
                     ("xla", bn_relu_conv1x1_reference)):
        # fresh per variant: the compiled chunk donates its carry
        x0 = jnp.asarray(x_np, dt)
        w0 = jnp.asarray(w_np, dt)
        def loss(x, s, b, w):
            out, _m, _v = fn(x, s, b, w)
            return (out.astype(jnp.float32) * cot).sum()

        grad = jax.grad(loss, argnums=(0, 1, 2, 3))

        def chunk(x, w):
            def body(carry, _):
                x, w = carry
                dx, _dg, _db, dw = grad(x, scale, bias, w)
                # keep every iteration live: descend x and w a hair
                return (x - (1e-6 * dx).astype(x.dtype),
                        w - (1e-6 * dw).astype(w.dtype)), None
            (x, w), _ = jax.lax.scan(body, (x, w), None, length=K)
            return x, w

        t0 = time.perf_counter()
        compiled = jax.jit(chunk, donate_argnums=(0, 1)).lower(x0, w0).compile()
        compile_sec = time.perf_counter() - t0
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        x, w = compiled(x0, w0)
        float(jnp.sum(w.astype(jnp.float32)))  # readback fence
        t0 = time.perf_counter()
        for _ in range(timed):
            x, w = compiled(x, w)
        float(jnp.sum(w.astype(jnp.float32)))
        sec = time.perf_counter() - t0
        it_us = sec / (timed * K) * 1e6
        results.append({
            "n": n, "c": c, "f": f, "dtype": dtype, "variant": name,
            "us_per_iter": round(it_us, 1),
            "flops_per_iter": float(ca.get("flops") or 0.0) or None,
            "bytes_per_iter": float(ca.get("bytes accessed") or 0.0) or None,
            "compile_sec": round(compile_sec, 1),
            "backend": jax.default_backend(),
        })
        print(json.dumps(results[-1]), flush=True)
    return results


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--shapes", default="262144x224,4096x992",
                   help="comma-separated NxC list (f fixed at 128)")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    for s in args.shapes.split(","):
        n, c = (int(v) for v in s.split("x"))
        probe(n, c, dtype=args.dtype)


if __name__ == "__main__":
    main()
