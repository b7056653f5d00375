#!/usr/bin/env python
"""Batch-scaling probe for the flagship train step (PERF.md evidence tool).

For each requested batch size, AOT-compiles ONE 64-step ``lax.scan`` chunk of
the flagship partial-modality train step (identical program construction to
bench.measure_train_steps_per_sec — same model, losses, Adam, donation),
reads ``cost_analysis()`` from that same executable (flops + bytes accessed,
so the roofline position comes from the measured program, not a pin), then
times it value-fenced. One remote compile per batch size.

Usage (TPU, idle host — CLAUDE.md measurement rules):
    python benchmarks/probe_batch_scaling.py --batches 32,64

Prints one JSON line per batch size.
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

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_HBM_BYTES_PER_SEC = 819e9  # v5e HBM bandwidth
K = 64  # steps per dispatch


def probe(batch, timed_dispatches=3, discard=1, remat=False,
          trunk="concat", fused_bn1=False, folds=1):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _example_batch
    from bench import IMAGE_SHAPE, RNA_DIM, make_flagship_step
    from multimodal_survival_prediction_tpu.models import PartialModalityNet

    model = PartialModalityNet(dtype=jnp.bfloat16, remat=remat, trunk=trunk,
                               fused_bn1=fused_bn1)
    b_np = _example_batch(batch, IMAGE_SHAPE, RNA_DIM)
    if folds > 1:
        # per-fold batches differ (different seeds), matching
        # bench.measure_train_steps_per_sec's fold-parallel chunk
        b_np = {k: np.stack(
            [_example_batch(batch, IMAGE_SHAPE, RNA_DIM, seed=f)[k]
             for f in range(folds)]) for k in b_np}
    data_b = jax.device_put(b_np)
    rng = jax.random.PRNGKey(0)
    one_np = _example_batch(batch, IMAGE_SHAPE, RNA_DIM)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": rng, "dropout": rng},
            one_np["image"], one_np["rnaseq"], one_np["clinical"],
            one_np["mask"], train=False))

    def _zeros(s):
        shape = (folds, *s.shape) if folds > 1 else s.shape
        return np.zeros(shape, s.dtype)

    variables = jax.device_put(jax.tree_util.tree_map(_zeros, shapes))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    opt_state = jax.device_put(jax.tree_util.tree_map(
        _zeros, jax.eval_shape(tx.init, shapes["params"])))

    # shared with bench.measure_train_steps_per_sec — the probe times the
    # SAME loss/step program the bench headline pins (bench.py is the
    # source of truth; this probe only drops the 1-fold vmap wrapper, a
    # documented difference, docs/PERF.md). folds>1 adds the SAME vmap
    # wrapper the bench fold-parallel chunk uses.
    _, one_fold_step = make_flagship_step(model, tx)
    one_step = one_fold_step if folds == 1 else jax.vmap(one_fold_step)

    def chunk(p, bs, opt, b, keys):
        def body(carry, key1):
            p, bs, opt = carry
            p, bs, opt, loss = one_step(p, bs, opt, b, key1)
            return (p, bs, opt), loss

        (p, bs, opt), losses = jax.lax.scan(body, (p, bs, opt), keys)
        return p, bs, opt, losses.mean()

    key = jax.random.PRNGKey(1)

    def step_keys(seed):
        ks = jax.random.split(jax.random.fold_in(key, seed), K * folds)
        return ks if folds == 1 else ks.reshape(K, folds, 2)

    t0 = time.perf_counter()
    compiled = jax.jit(chunk, donate_argnums=(0, 1, 2)).lower(
        params, batch_stats, opt_state, data_b, step_keys(0)).compile()
    compile_sec = time.perf_counter() - t0
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    # XLA cost_analysis counts a lax.scan/while BODY ONCE (verified live on
    # the axon v5e: the K=64-step chunk reports 426.4 GFLOP at bs=32 —
    # exactly the single-step pin, not 64x it) — so the raw numbers ARE the
    # per-step costs, modulo the negligible loss-mean epilogue.
    flops_step = float(ca.get("flops") or 0.0) or None
    bytes_step = float(ca.get("bytes accessed") or 0.0) or None

    for i in range(1 + discard):
        params, batch_stats, opt_state, loss = compiled(
            params, batch_stats, opt_state, data_b, step_keys(i))
    float(loss)  # value readback = the only true fence on axon (CLAUDE.md)
    t0 = time.perf_counter()
    for i in range(timed_dispatches):
        params, batch_stats, opt_state, loss = compiled(
            params, batch_stats, opt_state, data_b, step_keys(100 + i))
    float(loss)
    sec = time.perf_counter() - t0
    steps_per_sec = timed_dispatches * K / sec

    out = {
        "batch": batch,
        "folds": folds,
        "remat": remat,
        "trunk": trunk,
        "fused_bn1": fused_bn1,
        "steps_per_sec": round(steps_per_sec, 2),
        "patients_per_sec": round(steps_per_sec * batch * folds, 1),
        "ms_per_step": round(1000.0 / steps_per_sec, 2),
        "flops_per_step": flops_step,
        "bytes_per_step": bytes_step,
        "mfu_pct": (round(100 * steps_per_sec * flops_step / PEAK_FLOPS, 2)
                    if flops_step else None),
        "hbm_sol_pct": (round(100 * steps_per_sec * bytes_step
                              / PEAK_HBM_BYTES_PER_SEC, 1)
                        if bytes_step else None),
        "arith_intensity_flop_per_byte": (round(flops_step / bytes_step, 1)
                                          if flops_step and bytes_step
                                          else None),
        "compile_sec": round(compile_sec, 1),
        "backend": __import__("jax").default_backend(),
    }
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", default="32,64")
    p.add_argument("--timed-dispatches", type=int, default=3)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize DenseNet dense layers (trade recompute"
                        " FLOPs for activation HBM traffic)")
    p.add_argument("--trunk", default="concat", choices=["concat", "dus"],
                   help="DenseNet concat-trunk strategy (round-4 HBM lever: "
                        "'dus' preallocates one full-width trunk per block, "
                        "models/densenet3d.py)")
    p.add_argument("--fused-bn1", action="store_true",
                   help="fuse every dense layer's norm1->relu->conv1 into "
                        "the two-pass Pallas op with custom VJP "
                        "(ops/fused_dense.py; round-4 HBM lever)")
    p.add_argument("--fused-bn1-rows", type=int, default=None,
                   help="selective variant: fuse only stages whose trunk has"
                        " <= this many rows (B*D*H*W) — the per-shape "
                        "crossover probe_fused_dense.py measured")
    p.add_argument("--folds", type=int, default=1,
                   help="vmap the step over K stacked fold states (the "
                        "bench fold-parallel chunk pattern) — probes "
                        "fold-parallel CV chip efficiency at non-reference "
                        "per-fold batches (VERDICT r4 stretch)")
    args = p.parse_args()
    fused = (args.fused_bn1_rows if args.fused_bn1_rows is not None
             else args.fused_bn1)
    for b in (int(x) for x in args.batches.split(",")):
        print(json.dumps(probe(b, timed_dispatches=args.timed_dispatches,
                               remat=args.remat, trunk=args.trunk,
                               fused_bn1=fused, folds=args.folds)),
              flush=True)


if __name__ == "__main__":
    main()
