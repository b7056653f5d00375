#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric (round 3): flagship training epoch throughput in patients/sec
at the AT-SCALE batch — partial-modality gated DenseNet121-3D, 64x64x32 CT,
5,005-gene RNA, fused fwd + Cox/gate losses + bwd + Adam, bf16, **bs=128**.
bs=128 is the measured batch-scaling sweet spot (probe_batch_scaling.py,
idle-machine confirmed 2026-08-17): 24.24 steps/s = 21.0% MFU and 3,103
patients/s program throughput, vs 13.6% MFU at bs=32 and ~7.5% at the
reference's own bs=8 — the program is HBM-bound (docs/PERF.md roofline), so
batch is the chip-efficiency knob (bs=152, the largest exact divisor of the
608-patient epoch, is anomalously SLOW: the batch axis tiles at the 128-lane
boundary, so any batch in (128, 256] streams a 256-padded layout — measured
via controlled bs=96/112/160 probes, docs/PERF.md round-3b; 128 and 256 are
the only efficient points above 112 and 128 wins).
The headline value is EPOCH-adjusted: 608 patients take ceil(608/128)=5
steps (the engine cycles padding on the ragged last batch), so epoch
patients/s = steps/s * 608/5 — 5% below the program's steady-state rate,
charged honestly. bs=32 / bs=8 remain available for round-2/3 continuity
via BENCH_BS32=1 / BENCH_BS8=1.

Also emitted:
  * flops_per_step + mfu_pct from compiled.cost_analysis() against the v5e
    peak (197 TFLOP/s bf16) — so speed is judged against the chip, not only
    against the torch-CPU reference.
  * preprocess vols/sec: TRANSFER-AWARE, mirroring data/pipeline.py's
    auto-selection — the host C++ fused resample (ship the 512 KB result)
    is measured against the device path (ship the 84 MB int16 volume over
    the link); the link bandwidth probe and both numbers are emitted, and
    the headline preprocess number is the selected path's.
  * BENCH_FOLD_PARALLEL=1 (opt-in), or automatic when its executable is
    already warm in the AOT cache and budget remains: the 5-fold vmapped
    chunk (train/cv_parallel.py's compute pattern, reference
    hyperparameters, bs=8 PER FOLD). Measured live 2026-08-17: 24.0
    vmapped steps/s = 960.9 patients/s — per-fold params make the convs
    GROUPED, so this path amortizes dispatch/Python overhead (its win over
    the sequential driver) but cannot batch the MXU like bs=32 does;
    docs/PERF.md.
  * BENCH_BS8=1 (opt-in): the round-2 single-fold bs=8 chunk.
  * BENCH_BS32=1 (opt-in): the round-3 bs=32 chunk (58.99 steps/s = 12.8%
    MFU measured live 2026-08-17), for continuity with BENCH_r03 history.
  * BENCH_FP32=1 (opt-in): fp32 variant of the headline.
  * BENCH_SCAN_EPOCH=1 (opt-in) or automatic when the remaining
    wall-clock budget allows: the production whole-epoch lax.scan path.
    Its fresh remote compile alone exceeds the default ~8-min budget on
    this tunnel (compiles are NOT captured by the persistent cache), so by
    default the result carries a probe record explaining the skip.
Each extra train program is a multi-minute uncacheable remote compile, hence
ONE default train phase.

AOT executable cache (io/aot_cache.py): the remote tunnel's compiles are
not captured by XLA's persistent cache, but the COMPILED executable is
serialized to `.bench_aot_cache/` and a later bench process on the same
machine loads it in milliseconds — so a pre-warmed bench run makes the
next run's train phases nearly compile-free, and the budget probe then
runs the scan-epoch phase live instead of skipping it. Fail-open (any
cache problem falls back to a normal compile; measured steady-state
timing is unaffected either way). BENCH_AOT_CACHE=0 disables; set a path
to relocate the cache.

vs_baseline: ratio to the reference pipeline's epoch throughput measured on
THIS machine's CPU (torch fwd+bwd step + per-sample host normalize+zoom that
the reference redoes every epoch; benchmarks/torch_reference.py), in
patients/sec — the reference trains its 5 folds sequentially at that rate.
The baseline measurement is cached in BENCH_BASELINE_CACHE.json since
torch-CPU DenseNet3D steps are slow.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Persistent XLA compilation cache: compiles through the axon remote-compile
# tunnel cost minutes; cache them across processes.
import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

CACHE = Path(__file__).resolve().parent / "BENCH_BASELINE_CACHE.json"

# Disk-backed AOT executable cache (see module docstring). Per-machine, like
# a ccache dir (io/aot_cache.py refuses entries on any env drift), so it is
# gitignored; a cold cache simply behaves like round 2's bench.
_aot_env = os.environ.get("BENCH_AOT_CACHE", "")
AOT_DIR = (None if _aot_env == "0" else _aot_env
           or str(Path(__file__).resolve().parent / ".bench_aot_cache"))

N_PATIENTS = 608  # flagship epoch size (348 labeled + 260 unlabeled)
N_IMAGING = 142
BATCH = 8           # reference flagship batch size (per fold)
HEADLINE_BATCH = 128  # at-scale batch: measured scaling sweet spot, 21% MFU
FOLDS = 5         # reference flagship n_folds (shipped results; SURVEY §2.13)
IMAGE_SHAPE = (64, 64, 32)
RNA_DIM = 5005
CT_SHAPE = (160, 512, 512)  # typical TCGA-OV CT series
PEAK_FLOPS = {"tpu": 197e12}  # v5e bf16 peak (per chip)

# Driver wall-clock budget assumption (sec). The scan-epoch phase only runs
# automatically when the estimated remaining budget covers its fresh remote
# compile; override with BENCH_BUDGET_SEC.
BUDGET_SEC = float(os.environ.get("BENCH_BUDGET_SEC", "480"))
SCAN_EPOCH_EST_SEC = 700  # ~10+ min of remote compiles + run (docs/PERF.md)
# when the scan-epoch executable is already in the AOT cache: cohort
# device_put (~330 MB over the link) + trace/lower + measurement only
SCAN_EPOCH_WARM_EST_SEC = 240
# fold-parallel chunk: cold = its own multi-minute remote compile (opt-in
# only); warm = exe load + 5-fold zeros-state device_put + timed dispatches
FOLD_PARALLEL_EST_SEC = 420
FOLD_PARALLEL_WARM_EST_SEC = 150

# Hard deadline for the ONE-JSON-LINE invariant. A DOWN axon tunnel blocks
# the process's FIRST backend use (jax.default_backend / jax.devices) for
# ~25 minutes before erroring (observed 2026-08-17, CLAUDE.md) — without a
# watchdog that silently eats the driver's whole budget and no JSON line is
# ever printed. Each opt-in phase is its own multi-minute remote compile, so
# the default deadline grows with the number of enabled opt-ins.
_OPT_INS = ("BENCH_BS32", "BENCH_BS8", "BENCH_FOLD_PARALLEL", "BENCH_FP32",
            "BENCH_SCAN_EPOCH")
WATCHDOG_SEC = float(os.environ.get(
    "BENCH_WATCHDOG_SEC",
    str(540 + 360 * sum(os.environ.get(v) == "1" for v in _OPT_INS))))
# An EXPLICIT BENCH_WATCHDOG_SEC is an absolute deadline the user owns:
# phase re-arms must preserve it (re-arm to the REMAINING user budget),
# not replace it with a phase estimate in either direction.
WATCHDOG_EXPLICIT = "BENCH_WATCHDOG_SEC" in os.environ


def _start_watchdog(deadline_sec: float):
    """Daemon timer: emit the failure JSON and hard-exit if main() wedges.

    Runs in a thread so it fires even while the main thread is stuck inside
    PJRT backend init (a C-level poll loop Python signal handlers may never
    interrupt). ``os._exit`` because a wedged runtime cannot be unwound.
    """
    import threading

    def _fire():  # pragma: no cover - only fires on a wedged backend
        print(json.dumps({
            "metric": "partial_modality_epoch_throughput", "value": 0.0,
            "unit": "patients/s", "vs_baseline": 0.0,
            "errors": [f"watchdog: bench did not complete within "
                       f"{deadline_sec:.0f}s (BENCH_WATCHDOG_SEC) — TPU "
                       "tunnel down or pathologically slow"]}), flush=True)
        os._exit(3)

    t = threading.Timer(deadline_sec, _fire)
    t.daemon = True
    t.start()
    return t


def _rearm_watchdog(watchdog, phase_est_sec: float, elapsed_sec: float):
    """Re-arm before a budget-gated phase whose worst case (a stale warm
    prediction paying the full compile) exceeds the default deadline.
    With an EXPLICIT BENCH_WATCHDOG_SEC the user's absolute deadline wins:
    re-arm to the remaining user budget instead of the phase estimate.

    Returns ``(watchdog, deadline_at)`` — deadline bookkeeping lives HERE so
    every caller's ``wd_deadline_at`` stays consistent with the timer that
    will actually fire (round-3 advisor: recomputing it at call sites drifts).
    """
    watchdog.cancel()
    if WATCHDOG_EXPLICIT:
        deadline_sec = max(WATCHDOG_SEC - elapsed_sec, 1.0)
    else:
        deadline_sec = phase_est_sec
    return _start_watchdog(deadline_sec), time.perf_counter() + deadline_sec


# FLOPs per train step from compiled.cost_analysis() of the exact programs
# below, derived live on the v5e (jax on the axon backend) — a static
# property of the (folds, shapes, dtype) program, so it is pinned rather
# than paying a second multi-minute remote compile every bench run (the jit
# timing path and the AOT cost-analysis path cannot share a compile, and the
# persistent cache does not capture remote-compiled executables). Re-derive
# live with BENCH_COST_ANALYSIS=1 after changing the model/shapes.
PINNED_FLOPS = {
    # (dtype, folds, batch, image_shape, rna_dim) -> flops/step (fwd+bwd+Adam;
    # for folds > 1 this is the WHOLE vmapped step across all folds)
    ("bf16", 1, 8, (64, 64, 32), 5005): 106805780480.0,   # derived 2026-08-16
    ("bf16", 1, 32, (64, 64, 32), 5005): 427531010048.0,  # derived 2026-08-17
    # derived live 2026-08-17 via benchmarks/probe_batch_scaling.py (the
    # scan-chunk cost analysis counts the body once, i.e. per-step)
    ("bf16", 1, 128, (64, 64, 32), 5005): 1705442672640.0,
    # 5-fold vmapped step, derived live on the v5e 2026-08-17 (~19% above
    # 5x the single-fold pin: XLA schedules the per-fold grouped convs
    # differently than five separate steps)
    ("bf16", 5, 8, (64, 64, 32), 5005): 636991832064.0,
}


def _compiled_flops(compiled):
    """flops per execution from XLA cost analysis (None if unsupported)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = ca.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


STEPS_PER_DISPATCH = 64  # lax.scan chunk length of the timed train program


def make_flagship_step(model, tx):
    """(loss_fn, one_step) for the flagship train program — the SINGLE
    source of truth for the loss composition (Cox on labeled samples +
    0.01 x gate entropy on valid samples, reference
    partial_modality_training.py:296-331) and the grad/clip/Adam update
    that both this bench and benchmarks/probe_batch_scaling.py time.
    Factored out so the probe's roofline numbers can never drift from the
    program the bench headline actually measures."""
    import jax
    import optax

    from multimodal_survival_prediction_tpu.ops.cox import (
        cox_partial_likelihood,
        gate_entropy_loss,
    )

    def loss_fn(p, bs, b, key):
        (hazard, gates), mut = model.apply(
            {"params": p, "batch_stats": bs},
            b["image"], b["rnaseq"], b["clinical"], b["mask"], train=True,
            rngs={"dropout": key}, mutable=["batch_stats"])
        loss = cox_partial_likelihood(
            hazard, b["time"], b["event"], valid=b["svalid"]
        ) + 0.01 * gate_entropy_loss(gates, valid=b["valid"])
        return loss, mut["batch_stats"]

    def one_step(p, bs, opt, b, k):
        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, bs, b, k)
        updates, new_opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), new_bs, new_opt, loss

    return loss_fn, one_step


_PHASE_MARK = None  # diagnostic hook (benchmarks/probe_headline_phase.py)


def _mark(label):
    """Phase boundary inside measure_train_steps_per_sec — no-op unless a
    diagnostic caller installed bench._PHASE_MARK. device_put is async on
    this backend, so 'submitted' marks bound dispatch cost only; queued
    transfer time drains (and is attributed) at the warmup value fence."""
    if _PHASE_MARK is not None:
        _PHASE_MARK(label)


def measure_train_steps_per_sec(dtype=None, folds=1, batch=HEADLINE_BATCH,
                                timed_dispatches=3, discard=1):
    """Times a 64-step ``lax.scan`` chunk program, each step advancing
    ``folds`` stacked training states of batch ``batch`` simultaneously
    (``jax.vmap`` over the fold axis — the exact compute pattern of
    train/cv_parallel.py's fold-parallel epoch; folds=1 is a plain
    single-model chunk).

    One dispatch per 64 steps: a per-step program is dispatch-bound through
    the axon tunnel (~10-25 ms/call of fixed dispatch+readback cost), while
    the chunk amortizes dispatch to <0.5 ms/step and reads out the real
    device step time; a scan's remote compile costs the same as a
    single-step program (measured 217 s vs 250 s). Timing is fenced by VALUE
    READBACK — on this backend block_until_ready returns before execution
    finishes (CLAUDE.md). Returns (steps/sec, flops_per_step, flops_source)
    where flops_per_step covers ALL folds of one vmapped step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _example_batch
    from multimodal_survival_prediction_tpu.models import PartialModalityNet

    model = PartialModalityNet(dtype=dtype)
    one_np = _example_batch(batch, IMAGE_SHAPE, RNA_DIM)
    # per-fold batches differ (different seeds) like real fold-parallel CV
    stacked_np = {
        k: np.stack([_example_batch(batch, IMAGE_SHAPE, RNA_DIM, seed=f)[k]
                     for f in range(folds)])
        for k in one_np
    }
    data_b = jax.device_put(stacked_np)
    rng = jax.random.PRNGKey(0)
    # abstract init + host-zeros materialization: running the real 121-layer
    # init is a SECOND multi-minute remote compile on the axon tunnel, and
    # param values are irrelevant to throughput (TPU matmul time is data-
    # independent; the Cox loss stays finite on zero hazards). One bulk
    # device_put beats per-leaf jnp.zeros (each of ~2k leaves would be its
    # own tunnel round trip — measured 30+ s). The fold axis is stacked on
    # the host zeros directly.
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": rng, "dropout": rng},
            one_np["image"], one_np["rnaseq"], one_np["clinical"],
            one_np["mask"], train=False))
    _mark("host batch built + data device_put submitted "
          "+ abstract-init eval_shape traced")
    variables = jax.device_put(jax.tree_util.tree_map(
        lambda s: np.zeros((folds, *s.shape), s.dtype), shapes))
    _mark("zeros variables device_put submitted")
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    # optimizer state the same way: eager tx.init would dispatch zeros_like
    # per Adam-moment leaf (each a tunnel round trip)
    opt_state = jax.device_put(jax.tree_util.tree_map(
        lambda s: np.zeros((folds, *s.shape), s.dtype),
        jax.eval_shape(tx.init, shapes["params"])))
    _mark("zeros opt_state device_put submitted")

    _, one_fold_step = make_flagship_step(model, tx)
    vstep = jax.vmap(one_fold_step)

    def chunk(p, bs, opt, b, keys):
        # keys: (K, folds, 2) — independent dropout chain per fold per step
        def body(carry, key_f):
            p, bs, opt = carry
            p, bs, opt, loss = vstep(p, bs, opt, b, key_f)
            return (p, bs, opt), loss.mean()

        (p, bs, opt), losses = jax.lax.scan(body, (p, bs, opt), keys)
        return p, bs, opt, losses.mean()

    key = jax.random.PRNGKey(1)
    dkey = "bf16" if dtype == jnp.bfloat16 else "fp32"
    flops = PINNED_FLOPS.get((dkey, folds, batch, IMAGE_SHAPE, RNA_DIM))
    flops_src = "pinned" if flops else None
    if os.environ.get("BENCH_COST_ANALYSIS") == "1":
        # opt-in live re-derivation: AOT compile is a second remote compile.
        # Analyzed on the SINGLE vmapped step; the chunk body is identical,
        # so per-step flops match (mod the scalar loss-mean epilogue).
        compiled = jax.jit(vstep).lower(
            params, batch_stats, opt_state, data_b,
            jax.random.split(key, folds)).compile()
        live = _compiled_flops(compiled)
        if live:
            flops, flops_src = live, "live"
        print(f"[bench] cost_analysis({dkey}, folds={folds}): {live} "
              f"flops/step (live); using {flops_src}", file=sys.stderr)

    K = STEPS_PER_DISPATCH

    def step_keys(seed):
        return jax.random.split(
            jax.random.fold_in(key, seed), K * folds).reshape(K, folds, 2)

    step = jax.jit(chunk, donate_argnums=(0, 1, 2))
    if AOT_DIR:
        # disk-backed executable cache: a pre-warmed run already paid this
        # program's multi-minute remote compile; donation/aliasing is baked
        # into the serialized executable. Fail-open on any cache problem.
        from multimodal_survival_prediction_tpu.io.aot_cache import (
            cached_compile,
        )
        step, aot_info = cached_compile(
            step, params, batch_stats, opt_state, data_b, step_keys(0),
            cache_dir=AOT_DIR,
            extra_meta={"program": "bench_chunk", "dtype": dkey,
                        "folds": folds, "batch": batch})
        print(f"[bench] chunk({dkey},folds={folds},bs={batch}) aot-cache "
              f"{aot_info['source']}", file=sys.stderr)
    _mark("program ready (trace+lower+compile_or_load done)")
    # compile + warmup/discard. SYNC VIA VALUE READBACK, NOT
    # block_until_ready: on the axon backend block_until_ready returns
    # BEFORE the computation finishes (measured: "block" 8.6 ms, then the
    # value fetch stalled 47 s draining the queue) — only float(loss) is a
    # true barrier. Device execution is in-order, so one readback at the end
    # fences every dispatch before it.
    for i in range(1 + discard):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, data_b, step_keys(i))
    float(loss)
    _mark("warmup+discard fenced (all queued transfers drained here)")
    t0 = time.perf_counter()
    for i in range(timed_dispatches):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, data_b, step_keys(100 + i))
    float(loss)
    return (timed_dispatches * K / (time.perf_counter() - t0), flops,
            flops_src)


def measure_preprocess(device_budget_sec=15.0, host_reps=5):
    """Transfer-aware CT ingest, mirroring data/pipeline.py's auto-selection.

    Measures BOTH paths for a 160x512x512 int16 CT -> 64x64x32 tensor:
      * device: ship the 84 MB volume (int16, half the fp32 bytes), fused
        resample+normalize on device — end-to-end incl. transfer, plus a
        kernel-only number (device-resident input, 128 resamples per scan
        dispatch to amortize the ~27 ms dispatch+readback cost).
      * host: the GIL-free C++ fused kernel (csrc/msp_native.cpp) on the
        decoded volume; only the 512 KB result would cross the link.
    Returns a dict with both numbers, the probed link bandwidth, and the
    selected path (same bandwidth rule as VolumePrefetcher 'auto')."""
    import jax
    import numpy as np

    from multimodal_survival_prediction_tpu.data.native import (
        native_available,
        resample_normalize_host,
    )
    from multimodal_survival_prediction_tpu.data.pipeline import (
        probe_link_bandwidth,
    )
    from multimodal_survival_prediction_tpu.ops.resample import (
        resample_normalize,
        resample_normalize_pallas,
    )

    out = {"device_vols_per_sec": None, "host_vols_per_sec": None,
           "kernel_vols_per_sec": None, "link_mb_per_sec": None,
           "selected": None, "vols_per_sec": None}
    rng = np.random.default_rng(0)
    vol = rng.integers(-1024, 3072, size=CT_SHAPE, dtype=np.int16)
    out_bytes = int(np.prod(IMAGE_SHAPE)) * 4

    bw = probe_link_bandwidth()
    out["link_mb_per_sec"] = round(bw / 1e6, 1)

    # ---- host C++ path (its failure must not discard the independent
    # device/kernel sub-measurements below — same contract as the
    # kernel-only try/except) ----
    host_sec = None
    if native_available():
        try:
            resample_normalize_host(vol, IMAGE_SHAPE)  # warm (page-in)
            t0 = time.perf_counter()
            for _ in range(host_reps):
                res = resample_normalize_host(vol, IMAGE_SHAPE)
            host_sec = (time.perf_counter() - t0) / host_reps
            # end-to-end = resample + the 512 KB result crossing the link
            host_e2e = 1.0 / (host_sec + out_bytes / bw)
            out["host_vols_per_sec"] = round(host_e2e, 3)
            del res
        except Exception:
            import traceback

            traceback.print_exc(file=sys.stderr)
            host_sec = None

    # ---- device path (end-to-end incl. host->device transfer) ----
    fn = (resample_normalize_pallas if jax.default_backend() == "tpu"
          else resample_normalize)
    dev = fn(vol, IMAGE_SHAPE)  # compile
    # sync via value readback — axon block_until_ready returns early
    np.asarray(dev)
    t0 = time.perf_counter()
    np.asarray(fn(vol, IMAGE_SHAPE))
    probe = time.perf_counter() - t0
    timed = max(2, min(8, int(device_budget_sec / max(probe, 1e-3))))
    t0 = time.perf_counter()
    for _ in range(timed):
        dev = fn(vol, IMAGE_SHAPE)  # includes host->device transfer
    np.asarray(dev)
    out["device_vols_per_sec"] = round(
        timed / (time.perf_counter() - t0), 3)

    # ---- kernel-only: device-resident input, K resamples per dispatch ----
    import traceback

    import jax.numpy as jnp

    K = 128
    try:
        @jax.jit
        def k_resamples(v):
            def body(c, i):
                # `c + i` varies the input so loop-invariant code motion
                # can't hoist the resample (costs one int16 HBM copy/iter —
                # conservative)
                return c, fn(c + i, IMAGE_SHAPE).sum()

            _, ys = jax.lax.scan(body, v, jnp.arange(K, dtype=v.dtype))
            return ys

        dvol = jnp.asarray(vol)
        np.asarray(k_resamples(dvol))[:1]
        t0 = time.perf_counter()
        np.asarray(k_resamples(dvol))[:1]
        out["kernel_vols_per_sec"] = round(
            K / (time.perf_counter() - t0), 3)
    except Exception:
        # independent phase: a kernel-measurement failure must not discard
        # the already-measured numbers
        traceback.print_exc(file=sys.stderr)

    # ---- selection: the rule VolumePrefetcher('auto') applies ----
    if host_sec is not None and host_sec < vol.nbytes / bw:
        out["selected"] = "host-resample"
        out["vols_per_sec"] = out["host_vols_per_sec"]
    else:
        out["selected"] = "device-resample"
        out["vols_per_sec"] = out["device_vols_per_sec"]
    return out


def measure_scan_epoch_patients_per_sec(timed_epochs=3):
    """Production path: whole epoch as ONE jitted lax.scan dispatch over the
    device-resident 608-patient cohort (train/engine.py). Opt-in or
    budget-gated: the scan program's fresh remote compile alone exceeds the
    default bench budget."""
    import jax
    import numpy as np

    from __graft_entry__ import _example_batch
    from multimodal_survival_prediction_tpu.config import PARTIAL_MODALITY
    from multimodal_survival_prediction_tpu.train.adapters import (
        make_model_and_adapters,
    )
    from multimodal_survival_prediction_tpu.train.engine import (
        TrainConfig,
        Trainer,
    )

    import jax.numpy as jnp

    cfg = PARTIAL_MODALITY
    model, batch_to_inputs, hazard_and_aux = make_model_and_adapters(
        cfg, rna_dim=RNA_DIM)
    data_np = _example_batch(N_PATIENTS, IMAGE_SHAPE, RNA_DIM)
    data = {k: jnp.asarray(v) for k, v in data_np.items() if k != "valid"}
    trainer = Trainer(model, batch_to_inputs, hazard_and_aux,
                      TrainConfig(batch_size=cfg.batch_size),
                      aot_cache_dir=AOT_DIR)
    # zeros-materialized state, same trick as the chunk bench: the real
    # 121-layer init is its own multi-minute remote compile/dispatch storm,
    # and param VALUES are irrelevant to throughput (TPU matmul time is
    # data-independent; Cox/gate losses stay finite on zero hazards)
    from multimodal_survival_prediction_tpu.train.engine import TrainState
    example = {**{k: v[:cfg.batch_size] for k, v in data_np.items()},
               "valid": data_np["svalid"][:cfg.batch_size]}
    rng = jax.random.PRNGKey(0)
    inputs = batch_to_inputs(example)
    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, *inputs,
                           train=False))
    variables = jax.device_put(jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes))
    opt_state = jax.device_put(jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype),
        jax.eval_shape(trainer.tx.init, shapes["params"])))
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))
    rows = np.arange(N_PATIENTS)
    shuffle = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    state, _ = trainer.train_epoch(state, data, rows, shuffle, 1e-4, key)
    t0 = time.perf_counter()
    for _ in range(timed_epochs):
        state, loss = trainer.train_epoch(
            state, data, rows, shuffle, 1e-4, key)
    dt = time.perf_counter() - t0
    _write_scan_epoch_marker(trainer)
    return timed_epochs * N_PATIENTS / dt


SCAN_EPOCH_MARKER = "bench_scan_epoch.keys.json"


def _write_scan_epoch_marker(trainer):
    """Record the exact AOT-cache keys THIS bench's scan-epoch program hit,
    so the next run's warm prediction checks those entries specifically.
    Generic meta-tag matching is not enough here: a training CLI sharing the
    cache dir writes {program: train_epoch, model: PartialModalityNet}
    entries for its own (different) fold shapes, which would predict 'warm'
    for a program this bench has never compiled."""
    if not AOT_DIR:
        return
    try:
        info = getattr(trainer._train_epoch_fn, "info", None)
        if not info:
            return
        from multimodal_survival_prediction_tpu.io.aot_cache import (
            _env_fingerprint,
        )
        keys = sorted({v["key"] for v in info.values()})
        (Path(AOT_DIR) / SCAN_EPOCH_MARKER).write_text(json.dumps(
            {"keys": keys, "env": _env_fingerprint()}))
    except Exception as e:  # marker is an optimization, never a failure
        print(f"[bench] scan-epoch marker write failed: {e}",
              file=sys.stderr)


def _cache_warm(**tags):
    """True iff an AOT-cache entry matches ALL `tags` in the CURRENT
    environment. The tags must be specific enough to pin the program:
    bench_chunk entries are written ONLY by this bench with exact
    program/dtype/folds/batch tags, so for those a warm prediction can
    only be wrong if the chunk program's code changed since the cache was
    written (then the phase pays the compile; main() re-arms the watchdog
    with cold-compile headroom before entering any warm-gated phase).
    Trainer-written tags (train_epoch/model/batch_size) do NOT pin data
    shapes — use :func:`_scan_epoch_cache_warm`'s key marker for those."""
    if not AOT_DIR:
        return False
    try:
        from multimodal_survival_prediction_tpu.io.aot_cache import (
            _env_fingerprint,
        )

        env = _env_fingerprint()
        for m in Path(AOT_DIR).glob("*.meta.json"):
            j = json.loads(m.read_text())
            if (all(j.get(k) == v for k, v in tags.items())
                    and all(j.get(k) == v for k, v in env.items())):
                return True
    except Exception:
        pass
    return False


def _scan_epoch_cache_warm():
    """Warm-cache check for THIS bench's scan-epoch program: the marker a
    previous successful scan-epoch run wrote records the exact cache keys
    that program hit; warm means every one still has its executable and
    the env fingerprint matches. A trainer CLI sharing the cache dir
    writes same-tagged entries for DIFFERENT fold shapes, so generic tag
    matching would predict warm for a never-compiled program and blow the
    budget gate by a full remote compile."""
    if not AOT_DIR:
        return False
    try:
        from multimodal_survival_prediction_tpu.io.aot_cache import (
            _env_fingerprint,
        )

        marker = Path(AOT_DIR) / SCAN_EPOCH_MARKER
        if not marker.exists():
            return False
        j = json.loads(marker.read_text())
        if j.get("env") != _env_fingerprint():
            return False
        keys = j.get("keys") or []
        return bool(keys) and all(
            (Path(AOT_DIR) / f"{k}.jaxexe").exists() for k in keys)
    except Exception:
        return False


def _tail_floor_rearm(watchdog, wd_deadline_at, wd_armed_at,
                      pending_optins=0):
    """Guarantee the post-headline phases at least ``floor_sec`` of watchdog,
    re-arming only when that would EXTEND the current deadline (never
    shortens a cold-headline extension). The floor sizes to pending work
    (round-3 advisor): 180 s covers preprocess (~45 s) + JSON emit, plus
    360 s per enabled opt-in train phase still to run — each of those can
    pay a fresh multi-minute remote compile.

    On a slow-transfer day even the WARM headline phase has measured
    308-480 s (2026-08-19 — per-transfer round trips balloon, execution
    itself stays normal); a real-but-late JSON line beats the watchdog's
    0.0 line. Explicit BENCH_WATCHDOG_SEC remains the user's absolute
    deadline (caller gates on WATCHDOG_EXPLICIT).

    Returns ``(watchdog, wd_deadline_at)``.
    """
    floor_sec = 180 + 360 * pending_optins
    now = time.perf_counter()
    remaining = wd_deadline_at - now
    if remaining >= floor_sec:
        return watchdog, wd_deadline_at
    print(f"[bench] headline left {remaining:.0f}s of watchdog: re-armed "
          f"to {floor_sec:.0f}s tail floor ({pending_optins} opt-in "
          f"phases pending)", file=sys.stderr)
    return _rearm_watchdog(watchdog, floor_sec, now - wd_armed_at)


def _cold_headline_deadline():
    """Initial-watchdog deadline (sec) when the headline program will pay a
    fresh remote compile, or None to keep the default arm.

    Measured 2026-08-19: with the headline entry absent from the AOT cache,
    a slow-tunnel day blew the 540 s default — the fresh remote compile
    stored its executable at +199 s and the first-upload measurement was
    still draining past +540 s, so the driver got the watchdog's 0.0 line
    despite a healthy (just slow) tunnel. An explicit BENCH_WATCHDOG_SEC is
    the user's absolute deadline and is never extended.
    """
    if WATCHDOG_EXPLICIT:
        return None
    if _cache_warm(program="bench_chunk", dtype="bf16", folds=1,
                   batch=HEADLINE_BATCH):
        return None
    return WATCHDOG_SEC + 480


def reference_baseline(refresh=False):
    if CACHE.exists() and not refresh:
        return json.loads(CACHE.read_text())
    from benchmarks.torch_reference import (
        measure_host_preprocess,
        measure_torch_train_step,
    )

    pre = measure_host_preprocess(CT_SHAPE, IMAGE_SHAPE)
    print(f"[bench] host preprocess: {pre:.3f}s/vol", file=sys.stderr)
    # torch DenseNet121-3D steps are minutes-per-step on this CPU; measure at
    # batch 2 and scale linearly (3D conv cost is ~linear in batch) to keep
    # the bench inside its time budget.
    small = max(2, BATCH // 4)
    step_small = measure_torch_train_step(small, IMAGE_SHAPE, RNA_DIM)
    step = step_small * (BATCH / small)
    print(f"[bench] torch step (bs={small}): {step_small:.2f}s "
          f"-> scaled bs={BATCH}: {step:.2f}s", file=sys.stderr)
    base = {"host_preprocess_sec_per_vol": pre,
            "torch_step_sec": step,
            "torch_step_measured_batch": small}
    CACHE.write_text(json.dumps(base, indent=2))
    return base


def main():
    import traceback

    # An explicit BENCH_WATCHDOG_SEC is an absolute deadline from THIS
    # moment (pre-backend-init) — re-arms must subtract everything since,
    # including the minutes a sick tunnel can spend inside backend init
    # (t_start below is only set after init and would silently extend the
    # user's deadline by that much).
    wd_armed_at = time.perf_counter()
    watchdog = _start_watchdog(WATCHDOG_SEC)
    wd_deadline_at = wd_armed_at + WATCHDOG_SEC  # non-explicit bookkeeping

    import jax

    backend = jax.default_backend()
    errors = []

    # Cold-headline headroom: re-arm AFTER backend init (the initial arm
    # must precede any jax use to cover a DOWN tunnel; _cache_warm's env
    # fingerprint needs devices).
    headroom = _cold_headline_deadline()
    if headroom is not None:
        print(f"[bench] headline aot-cache cold: watchdog re-armed "
              f"{WATCHDOG_SEC:.0f}s -> {headroom:.0f}s", file=sys.stderr)
        watchdog, wd_deadline_at = _rearm_watchdog(
            watchdog, headroom, time.perf_counter() - wd_armed_at)

    # Slow-transfer-day guard (2026-08-20): probe_headline_phase measured
    # the WARM headline phase at 308-677 s across same-day runs — the
    # warmup value fence drains queued uploads whose per-transfer round
    # trips balloon while execution itself stays normal — and the default
    # 540 s watchdog fired MID-HEADLINE, handing the driver a 0.0 line
    # from a healthy tunnel. Every _PHASE_MARK milestone inside
    # measure_train_steps_per_sec proves the tunnel is making progress,
    # so guarantee a remaining-watchdog floor at each one: 600 s after
    # "program ready" (the multi-minute transfer drain is next), 300 s
    # otherwise. A DOWN tunnel stops producing milestones and still trips
    # the then-current deadline. An explicit BENCH_WATCHDOG_SEC stays the
    # user's absolute deadline — no hook installed.
    if not WATCHDOG_EXPLICIT:
        global _PHASE_MARK

        def _milestone_rearm(label):
            nonlocal watchdog, wd_deadline_at
            floor = 600.0 if label.startswith("program ready") else 300.0
            now = time.perf_counter()
            if wd_deadline_at - now >= floor:
                return
            print(f"[bench] milestone '{label}': watchdog re-armed to "
                  f"{floor:.0f}s floor", file=sys.stderr)
            watchdog, wd_deadline_at = _rearm_watchdog(
                watchdog, floor, now - wd_armed_at)

        _PHASE_MARK = _milestone_rearm

    t_start = time.perf_counter()

    def _try(label, fn, *a, **kw):
        print(f"[bench] +{time.perf_counter() - t_start:.0f}s start {label}",
              file=sys.stderr)
        try:
            out = fn(*a, **kw)
            print(f"[bench] +{time.perf_counter() - t_start:.0f}s done "
                  f"{label}", file=sys.stderr)
            return out
        except Exception as e:
            errors.append(f"{label}: {type(e).__name__}: {e}")
            traceback.print_exc(file=sys.stderr)
            return None

    import jax.numpy as jnp

    hl = _try(f"train_bs{HEADLINE_BATCH}_bf16", measure_train_steps_per_sec,
              dtype=jnp.bfloat16, folds=1, batch=HEADLINE_BATCH)
    steps, flops, flops_src = hl if hl else (None, None, None)
    print(f"[bench] train bf16 bs={HEADLINE_BATCH}: {steps} steps/s "
          f"({flops} flops/step)", file=sys.stderr)

    if not WATCHDOG_EXPLICIT:  # tail floor; _tail_floor_rearm docstring
        pending = sum(os.environ.get(v) == "1" for v in
                      ("BENCH_BS32", "BENCH_FOLD_PARALLEL", "BENCH_BS8",
                       "BENCH_FP32"))
        watchdog, wd_deadline_at = _tail_floor_rearm(
            watchdog, wd_deadline_at, wd_armed_at, pending_optins=pending)

    bs32_steps, bs32_flops, bs32_src = None, None, None
    if os.environ.get("BENCH_BS32") == "1":
        # opt-in: the round-3 bs=32 headline program, for continuity
        r = _try("train_bs32_bf16", measure_train_steps_per_sec,
                 dtype=jnp.bfloat16, folds=1, batch=32)
        bs32_steps, bs32_flops, bs32_src = r if r else (None, None, None)
        print(f"[bench] single-fold bs32 bf16: {bs32_steps} steps/s",
              file=sys.stderr)

    fold_steps, fold_flops, fold_src = None, None, None
    if os.environ.get("BENCH_FOLD_PARALLEL") == "1":
        # opt-in: the 5-fold vmapped chunk (another multi-minute remote
        # compile) — reference hyperparameters, bs=8 per fold
        r = _try("train_fold_parallel_bf16", measure_train_steps_per_sec,
                 dtype=jnp.bfloat16, folds=FOLDS, batch=BATCH)
        fold_steps, fold_flops, fold_src = r if r else (None, None, None)
        print(f"[bench] fold-parallel bf16: {fold_steps} steps/s",
              file=sys.stderr)

    bs8_steps, bs8_flops, bs8_src = None, None, None
    if os.environ.get("BENCH_BS8") == "1":
        # opt-in: the round-2 single-fold bs=8 program, for continuity
        r = _try("train_bs8_bf16", measure_train_steps_per_sec,
                 dtype=jnp.bfloat16, folds=1, batch=BATCH)
        bs8_steps, bs8_flops, bs8_src = r if r else (None, None, None)
        print(f"[bench] single-fold bs8 bf16: {bs8_steps} steps/s",
              file=sys.stderr)

    fp32_steps, fp32_flops, fp32_src = None, None, None
    if os.environ.get("BENCH_FP32") == "1":
        r = _try(f"train_bs{HEADLINE_BATCH}_fp32",
                 measure_train_steps_per_sec,
                 folds=1, batch=HEADLINE_BATCH)
        fp32_steps, fp32_flops, fp32_src = r if r else (None, None, None)
        print(f"[bench] bs{HEADLINE_BATCH} fp32: {fp32_steps} steps/s",
              file=sys.stderr)

    pre = _try("preprocess", measure_preprocess) or {}
    print(f"[bench] preprocess: {pre}", file=sys.stderr)

    # ---- opportunistic scan-epoch phase (VERDICT r2 #8): run when opted in
    # or when the remaining budget demonstrably covers the fresh compile ----
    scan_patients_per_sec = None
    scan_probe = None
    elapsed = time.perf_counter() - t_start
    remaining = BUDGET_SEC - elapsed
    scan_warm = _scan_epoch_cache_warm()
    scan_est = SCAN_EPOCH_WARM_EST_SEC if scan_warm else SCAN_EPOCH_EST_SEC
    if os.environ.get("BENCH_SCAN_EPOCH") == "1" or remaining > scan_est:
        # re-arm the watchdog with headroom for the phase's WORST case (a
        # wrongly-predicted warm cache still pays the full compile) — a
        # late JSON line beats the watchdog's 0.0 line
        watchdog, wd_deadline_at = _rearm_watchdog(
            watchdog, SCAN_EPOCH_EST_SEC + 120,
            time.perf_counter() - wd_armed_at)
        print(f"[bench] scan epoch: aot-cache "
              f"{'warm' if scan_warm else 'cold'}", file=sys.stderr)
        scan_patients_per_sec = _try(
            "scan_epoch", measure_scan_epoch_patients_per_sec)
        print(f"[bench] scan epoch: {scan_patients_per_sec} patients/s",
              file=sys.stderr)
    else:
        scan_probe = {
            "elapsed_sec": round(elapsed, 1),
            "budget_sec": BUDGET_SEC,
            "est_cost_sec": scan_est,
            "aot_cache_warm": scan_warm,
            "reason": "whole-epoch scan is a fresh multi-minute remote "
                      "compile (not captured by the persistent cache on "
                      "this tunnel); remaining budget too small — see "
                      "docs/PERF.md for the measured 901.7 patients/s, or "
                      "set BENCH_SCAN_EPOCH=1",
        }

    # ---- opportunistic fold-parallel phase: only when its executable is
    # already warm in the AOT cache AND the remaining budget covers the
    # warm cost (never run cold here — that is a multi-minute remote
    # compile, reachable via BENCH_FOLD_PARALLEL=1) ----
    if fold_steps is None:
        elapsed = time.perf_counter() - t_start
        fold_warm = _cache_warm(program="bench_chunk", dtype="bf16",
                                folds=FOLDS, batch=BATCH)
        if fold_warm and BUDGET_SEC - elapsed > FOLD_PARALLEL_WARM_EST_SEC:
            # worst case the warm prediction is stale (the chunk program
            # changed): the phase pays the full compile — re-arm for it
            watchdog, wd_deadline_at = _rearm_watchdog(
                watchdog, FOLD_PARALLEL_EST_SEC + 120,
                time.perf_counter() - wd_armed_at)
            print("[bench] fold-parallel: aot-cache warm, running "
                  "opportunistically", file=sys.stderr)
            r = _try("train_fold_parallel_bf16", measure_train_steps_per_sec,
                     dtype=jnp.bfloat16, folds=FOLDS, batch=BATCH)
            fold_steps, fold_flops, fold_src = r if r else (None, None, None)
            print(f"[bench] fold-parallel bf16 (warm): {fold_steps} steps/s",
                  file=sys.stderr)

    if (steps is None and fp32_steps is None and bs8_steps is None
            and bs32_steps is None and fold_steps is None):
        watchdog.cancel()
        print(json.dumps({
            "metric": "partial_modality_epoch_throughput", "value": 0.0,
            "unit": "patients/s", "vs_baseline": 0.0, "errors": errors}))
        return

    def _epoch_patients_per_sec(steps_per_sec, batch):
        # Epoch throughput: the 608-patient epoch takes ceil(608/batch)
        # steps — the engine cycles padding on the ragged last batch, so a
        # non-dividing batch (bs=128: 5 steps for 608) is charged for its
        # padding. Equals steps/s * batch when batch divides 608.
        return steps_per_sec * N_PATIENTS / -(-N_PATIENTS // batch)

    # The headline_* / flops / mfu fields always describe the program that
    # actually carried the headline (the fallbacks differ in dtype AND batch).
    headline_dtype = "bf16"
    headline_batch = HEADLINE_BATCH
    if steps is not None:
        our_patients_per_sec = _epoch_patients_per_sec(steps, HEADLINE_BATCH)
        headline_program = f"bs{HEADLINE_BATCH}_bf16"
        h_steps, h_flops, h_src = steps, flops, flops_src
    elif fp32_steps is not None:
        our_patients_per_sec = _epoch_patients_per_sec(
            fp32_steps, HEADLINE_BATCH)
        headline_dtype = "fp32"
        headline_program = f"bs{HEADLINE_BATCH}_fp32"
        h_steps, h_flops, h_src = fp32_steps, fp32_flops, fp32_src
    elif bs32_steps is not None:
        our_patients_per_sec = bs32_steps * 32  # 608 = 19 steps exactly
        headline_program = "bs32_bf16"
        headline_batch = 32
        h_steps, h_flops, h_src = bs32_steps, bs32_flops, bs32_src
    elif fold_steps is not None:
        our_patients_per_sec = fold_steps * FOLDS * BATCH
        headline_program = "fold_parallel_bf16"
        headline_batch = FOLDS * BATCH  # effective patients per vmapped step
        h_steps, h_flops, h_src = fold_steps, fold_flops, fold_src
    else:
        our_patients_per_sec = bs8_steps * BATCH
        headline_program = f"bs{BATCH}_bf16"
        headline_batch = BATCH
        h_steps, h_flops, h_src = bs8_steps, bs8_flops, bs8_src

    base = _try("torch_baseline", reference_baseline)
    if base is not None:
        n_steps = -(-N_PATIENTS // BATCH)
        ref_epoch_sec = (
            n_steps * base["torch_step_sec"]
            + N_IMAGING * base["host_preprocess_sec_per_vol"]
        )
        ref_patients_per_sec = N_PATIENTS / ref_epoch_sec
        vs_baseline = round(our_patients_per_sec / ref_patients_per_sec, 2)
    else:
        ref_patients_per_sec, vs_baseline = None, None

    peak = PEAK_FLOPS.get(backend)

    def _mfu(steps_, fl):
        if steps_ and fl and peak:
            return round(100.0 * steps_ * fl / peak, 2)
        return None

    result = {
        "metric": "partial_modality_epoch_throughput",
        "value": round(our_patients_per_sec, 3),
        "unit": "patients/s",
        "vs_baseline": vs_baseline,
        "backend": backend,
        "headline_dtype": headline_dtype,
        "headline_batch": headline_batch,
        "headline_program": headline_program,
        "steps_per_dispatch": STEPS_PER_DISPATCH,
        "train_steps_per_sec_bf16": round(steps, 3) if steps else None,
        "train_steps_per_sec_fp32": (round(fp32_steps, 3)
                                     if fp32_steps else None),
        "flops_per_step": h_flops,
        "flops_source": ({"live": "cost_analysis(live)",
                          "pinned": "cost_analysis(pinned, see "
                                    "PINNED_FLOPS)"}.get(h_src)
                         if h_flops else None),
        "mfu_pct": _mfu(h_steps, h_flops),
        "peak_flops": peak,  # v5e bf16 peak when backend == tpu
        # 5-fold vmapped chunk (BENCH_FOLD_PARALLEL=1; measured live
        # 2026-08-17: 24.0 steps/s = 960.9 patients/s, mfu 7.77% — grouped
        # per-fold convs amortize dispatch, not the MXU; docs/PERF.md)
        "fold_parallel_patients_per_sec": (
            round(fold_steps * FOLDS * BATCH, 3) if fold_steps else None),
        "fold_parallel_mfu_pct": _mfu(fold_steps, fold_flops),
        # round-2/3 continuity fields (BENCH_BS8=1 / BENCH_BS32=1)
        "bs8_train_steps_per_sec_bf16": (round(bs8_steps, 3)
                                         if bs8_steps else None),
        "bs8_mfu_pct": _mfu(bs8_steps, bs8_flops),
        "bs32_train_steps_per_sec_bf16": (round(bs32_steps, 3)
                                          if bs32_steps else None),
        "bs32_mfu_pct": _mfu(bs32_steps, bs32_flops),
        # transfer-aware preprocess (same selection rule as data/pipeline.py)
        "preprocess_vols_per_sec": pre.get("vols_per_sec"),
        "preprocess_path": pre.get("selected"),
        "preprocess_host_vols_per_sec": pre.get("host_vols_per_sec"),
        "preprocess_device_vols_per_sec": pre.get("device_vols_per_sec"),
        "preprocess_kernel_vols_per_sec": pre.get("kernel_vols_per_sec"),
        "link_mb_per_sec": pre.get("link_mb_per_sec"),
        "scan_epoch_patients_per_sec": (round(scan_patients_per_sec, 3)
                                        if scan_patients_per_sec else None),
        "scan_epoch_probe": scan_probe,
        "reference_cpu_patients_per_sec": (round(ref_patients_per_sec, 3)
                                           if ref_patients_per_sec else None),
    }
    if errors:
        result["errors"] = errors
    watchdog.cancel()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
