"""Fold-parallel cross-validation: every fold trained SIMULTANEOUSLY.

A capability the reference cannot express: its folds run strictly
sequentially (reference partial_modality_training.py:516-560 — a Python
`for fold` loop re-creating model/optimizer per fold). Here the K per-fold
training states are stacked along a leading fold axis, the whole-epoch
``lax.scan`` (train/engine.py) is ``jax.vmap``-ed over that axis, and the
fold axis is sharded over a device mesh — K folds advance one epoch in ONE
dispatch with ZERO cross-fold communication (each device group trains its
own folds against its local copy of the HBM-resident cohort; the models are
<40 MB so replicating the cohort + K states is cheap).

Wall-clock: on an N-device mesh this is ~min(K, N)× the sequential driver;
on a SINGLE chip it is still faster than sequential CV because the vmapped
convolutions batch K folds together (effective batch K·B), directly
attacking the small-batch underutilization documented in docs/PERF.md.

Trajectory fidelity to the sequential driver (train/cv.py) — same:
  * per-fold init RNG (``fold_in(PRNGKey(seed), fold)``),
  * per-fold shuffle RNG (``np.random.default_rng(seed + fold)``) and batch
    order (identical ``Trainer._pad_indices`` padding),
  * per-fold dropout-key chain (split once per epoch, then per step),
  * per-fold LR schedule (cosine / per-fold ReduceLROnPlateau),
  * best-checkpoint-by-val-C-index + early stopping semantics.
Fold step-count differences (train sets differ by ±1 patient) are handled by
masking WHOLE steps: padded steps pass the carried state through unchanged
(``jnp.where`` select), so a fold's parameter trajectory here matches its
sequential counterpart exactly (verified to float tolerance in
tests/test_cv_parallel.py). Early-stopped folds keep computing (their
records are frozen on the host) — total wall-clock is the SLOWEST fold's
stop epoch, not the sum.

Streaming composition (round 4): ``streaming=True`` keeps the cohort
HOST-resident and double-buffers STACKED (K, B, ...) batches onto the device
(data/pipeline.BatchPrefetcher), advancing all K folds one step per dispatch
via a vmapped single-step program — exceeds-HBM cohorts x compressed CV
wall-clock. Same whole-step masking and per-fold dropout-key chain as the
scan path, so trajectories match the device-resident driver exactly
(tests/test_cv_parallel.py::test_parallel_cv_streaming_matches_device
pins it). Prefer the device-resident scan whenever the cohort fits — one
dispatch per EPOCH beats one per step.

Not supported in this driver: resume checkpoints (use the sequential driver
for resumable long runs).
"""

from __future__ import annotations

import logging
import time as _time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from ..config import ModelRunConfig
from ..io.checkpoint import save_checkpoint, save_fold_meta
from .adapters import make_model_and_adapters
from .cv import (
    FoldOutcome,
    build_and_write_cv_payload,
    prepare_cv_data,
)
from .engine import TrainConfig, Trainer, TrainState
from .schedules import ReduceLROnPlateau, cosine_annealing

log = logging.getLogger(__name__)


def make_fold_mesh(n_devices: int | None = None, data_parallel: int = 1):
    """A (fold, data) mesh over the first n devices.

    data_parallel > 1 additionally shards each fold's batch dimension over
    the inner 'data' axis (fold x DP 2-D parallelism): with a (2, 4) mesh,
    two folds train concurrently, each batch-DP over 4 chips. The inner
    (fastest-varying) axis carries the within-fold collectives (hazard
    all-gather for the global Cox risk set, BatchNorm reductions), keeping
    them on nearest-neighbor ICI links; the fold axis needs NO collectives.
    """
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % data_parallel:
        raise ValueError(
            f"{n_devices} devices not divisible by data={data_parallel}")
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // data_parallel, data_parallel)
    return Mesh(grid, ("fold", "data"))


def _fold_sharding(mesh, axis_name):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis_name))


def _stack_states(states):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def assert_extras_invariant(ref, got, label):
    """Guard for the parallel drivers' vmap shortcut: the vmapped loss/eval
    closures capture ``trainer._extra_collections`` from the LAST
    ``init_state`` call un-stacked, which is only sound when every fold /
    candidate init produces IDENTICAL extra collections (true today — the
    mmsurv 'constants' sketch is fixed-seed and fold-invariant,
    models/mmsurv.py). If a future model's extra collections become
    init-RNG-dependent this fails loudly instead of silently training every
    fold against the last fold's constants."""
    r = jax.tree_util.tree_leaves(ref)
    g = jax.tree_util.tree_leaves(got)
    same = len(r) == len(g) and all(
        np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(r, g))
    if not same:
        raise ValueError(
            f"extra collections differ across stacked inits ({label}): the "
            "fold-parallel/sweep drivers assume init-invariant extra "
            "collections — stack them alongside params before vmapping "
            "this model")


def _build_parallel_train_epoch(trainer: Trainer):
    """vmap-over-folds version of Trainer._build_train_epoch with whole-step
    masking: a step whose bvalid row is all-zero (cross-fold step-count
    padding) passes the carried state through unchanged, so shorter folds'
    trajectories are unaffected by the shared scan length."""
    grad_fn = jax.value_and_grad(trainer._loss_fn, has_aux=True)
    tx = trainer.tx

    def fold_epoch(state, data, perm, bvalid, rng, lr):
        def step(carry, xs):
            st, key = carry
            idx, bv = xs
            batch = trainer._gather_batch(data, idx, bv)
            key, dkey = jax.random.split(key)
            (loss, new_bs), grads = grad_fn(
                st.params, st.batch_stats, batch, dkey)
            updates, new_opt = tx.update(grads, st.opt_state, st.params, lr)
            new_st = TrainState(
                params=optax.apply_updates(st.params, updates),
                batch_stats=new_bs, opt_state=new_opt, step=st.step + 1)
            valid = jnp.max(bv) > 0
            st = jax.tree_util.tree_map(
                lambda old, new: jnp.where(valid, new, old), st, new_st)
            return (st, key), jnp.where(valid, loss, 0.0)

        (state, _), losses = jax.lax.scan(step, (state, rng), (perm, bvalid))
        n_valid = jnp.maximum(jnp.sum(jnp.max(bvalid, axis=1) > 0), 1)
        return state, jnp.sum(losses) / n_valid

    vmapped = jax.vmap(fold_epoch, in_axes=(0, None, 0, 0, 0, 0))
    return jax.jit(vmapped, donate_argnums=(0,))


def _build_parallel_eval(trainer: Trainer):
    """vmap-over-folds pooled validation: (K,) C-index + (K,) mean loss.
    Fully-masked padding steps (val sizes differ across folds) contribute
    nothing: their rows are excluded from the pooled C-index by ``svalid``
    and from the mean loss by the valid-step count."""

    def eval_fold(params, batch_stats, data, idx, bvalid):
        # same scan body as the sequential driver (Trainer.eval_scan is the
        # single source of truth for eval semantics); only the loss
        # aggregation differs — fold stacking pads step COUNTS, so fully
        # masked steps must be excluded from the mean
        cindex, losses, _ = trainer.eval_scan(
            params, batch_stats, data, idx, bvalid)
        step_valid = jnp.max(bvalid, axis=1) > 0
        loss = (jnp.sum(jnp.where(step_valid, losses, 0.0))
                / jnp.maximum(jnp.sum(step_valid), 1))
        return cindex, loss

    vmapped = jax.vmap(eval_fold, in_axes=(0, 0, None, 0, 0))
    return jax.jit(vmapped)


def _build_parallel_train_step(trainer: Trainer):
    """vmap-over-folds SINGLE-step twin of _build_parallel_train_epoch's scan
    body, for the STREAMING path (per-step dispatch of a stacked (K, B, ...)
    host-prefetched batch). Key chain matches the scan body exactly: the
    per-fold key splits every step, masked or not, and whole-step masking
    passes the carried state through unchanged — so given identical batch
    order the streaming trajectory equals the scan trajectory."""
    grad_fn = jax.value_and_grad(trainer._loss_fn, has_aux=True)
    tx = trainer.tx

    def fold_step(st, batch, lr, key, step_valid):
        key, dkey = jax.random.split(key)
        (loss, new_bs), grads = grad_fn(st.params, st.batch_stats, batch,
                                        dkey)
        updates, new_opt = tx.update(grads, st.opt_state, st.params, lr)
        new_st = TrainState(
            params=optax.apply_updates(st.params, updates),
            batch_stats=new_bs, opt_state=new_opt, step=st.step + 1)
        st = jax.tree_util.tree_map(
            lambda old, new: jnp.where(step_valid, new, old), st, new_st)
        return st, key, jnp.where(step_valid, loss, 0.0)

    return jax.jit(jax.vmap(fold_step), donate_argnums=(0,))


def _build_parallel_eval_step(trainer: Trainer):
    """vmap-over-folds single-batch eval for the STREAMING path: (K, B)
    hazards + (K,) losses per stacked eval batch; pooling and the per-fold
    C-index happen on host (same bucket-padded concordance_index the
    sequential streaming eval uses)."""
    from ..ops.cox import cox_partial_likelihood

    def eval_step(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats,
                     **trainer._extra_collections}
        out = trainer.model.apply(
            variables, *trainer.batch_to_inputs(batch), train=False)
        hazard = trainer.hazard_and_aux(out, batch)[0]
        loss = cox_partial_likelihood(
            hazard, batch["time"], batch["event"], valid=batch["svalid"],
            ties=trainer.cfg.ties)
        return hazard, loss

    return jax.jit(jax.vmap(eval_step, in_axes=(0, 0, 0)))


def _stack_fold_indices(per_fold, batch_size, rngs):
    """Per-fold _pad_indices, then pad step counts to the cross-fold max with
    fully-invalid steps (idx 0, bvalid 0 — masked out as whole steps)."""
    padded = [Trainer._pad_indices(rows, batch_size, rng)
              for rows, rng in zip(per_fold, rngs)]
    steps = max(p[0].shape[0] for p in padded)
    idxs, bvalids = [], []
    for idx, bv in padded:
        extra = steps - idx.shape[0]
        if extra:
            idx = np.concatenate(
                [idx, np.zeros((extra, batch_size), np.int32)])
            bv = np.concatenate(
                [bv, np.zeros((extra, batch_size), np.float32)])
        idxs.append(idx)
        bvalids.append(bv)
    return np.stack(idxs), np.stack(bvalids)


def run_cross_validation_parallel(
    cfg: ModelRunConfig,
    table: pd.DataFrame,
    rnaseq_csv=None,
    results_dir="results",
    models_dir="models",
    mesh=None,
    fold_axis: str = "fold",
    data_axis: str = "data",
    backbone: str = "densenet121",
    dtype=None,
    remat: bool = False,
    use_pallas_resample: bool = False,
    hu_window=None,
    num_epochs: int | None = None,
    write_outputs: bool = True,
    aot_cache_dir=None,
    streaming: bool = False,
):
    """Fold-parallel CV run for one model config.

    Args:
      mesh: optional mesh whose ``fold_axis`` axis the stacked fold states
        are sharded over (``make_fold_mesh``). None = vmap on one device.
      fold_axis: mesh axis name carrying the fold dimension.
      data_axis: mesh axis name carrying each fold's batch dimension; when
        the mesh has it with size > 1 (``make_fold_mesh(N, data_parallel)``),
        per-epoch index arrays are sharded (fold, -, data) so every fold is
        additionally batch-DP within its device group (2-D parallelism).
      streaming: keep the cohort HOST-resident and double-buffer stacked
        (K, B, ...) batches onto the device per step (module docstring) —
        for cohorts whose arrays exceed HBM. Trajectories match the
        device-resident path exactly.

    Returns (payload, fold_outcomes) with the same schema as the sequential
    ``run_cross_validation`` — fold results are interchangeable.
    """
    name = cfg.name
    num_epochs = num_epochs or cfg.num_epochs

    # library-level multihost callers get the same coordinator-only write
    # guard as the sequential driver (the CLI pairs --multihost with the
    # sequential driver only, but nothing stops direct calls)
    from ..parallel.multihost import is_coordinator

    write_outputs = write_outputs and is_coordinator()

    arrays, splits = prepare_cv_data(
        cfg, table, rnaseq_csv=rnaseq_csv,
        use_pallas_resample=use_pallas_resample, hu_window=hu_window)
    rna_dim = arrays.arrays["rnaseq"].shape[1]
    n_folds = len(splits)

    # pad the fold axis to a multiple of the mesh axis size (dummy folds
    # reuse the last split's rows; they compute but are never recorded)
    shard_n = dict(mesh.shape).get(fold_axis, 1) if mesh is not None else 1
    k_pad = -(-n_folds // shard_n) * shard_n
    padded_splits = splits + [splits[-1]] * (k_pad - n_folds)

    model, batch_to_inputs, hazard_and_aux = make_model_and_adapters(
        cfg, rna_dim=rna_dim, backbone=backbone, dtype=dtype, remat=remat)
    tcfg = TrainConfig(
        batch_size=cfg.batch_size,
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        optimizer=cfg.optimizer,
        grad_clip=cfg.grad_clip,
        seed=cfg.seed,
        ties=cfg.ties,
    )
    trainer = Trainer(model, batch_to_inputs, hazard_and_aux, tcfg)

    if streaming:
        host_data = {k: np.asarray(v) for k, v in arrays.arrays.items()}
        data = None
    else:
        data = arrays.to_device(mesh=mesh)
    example = {k: np.asarray(v[:cfg.batch_size])
               for k, v in arrays.arrays.items()}
    example["valid"] = example["svalid"]

    t_start = _time.monotonic()

    # ---- stacked per-fold state (same per-fold init RNG as sequential) ----
    states, extras_ref = [], None
    for f in range(1, k_pad + 1):
        states.append(trainer.init_state(example, fold=f))
        extras = jax.device_get(trainer._extra_collections)
        if extras_ref is None:
            extras_ref = extras
        else:
            assert_extras_invariant(extras_ref, extras, f"fold {f}")
    state = _stack_states(states)
    del states
    data_n = dict(mesh.shape).get(data_axis, 1) if mesh is not None else 1
    if mesh is not None:
        sh = _fold_sharding(mesh, fold_axis)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), state)
        if data_n > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            idx_sh = NamedSharding(mesh, P(fold_axis, None, data_axis))
            if cfg.batch_size % data_n or tcfg.eval_batch_size % data_n:
                raise ValueError(
                    f"batch sizes ({cfg.batch_size}, {tcfg.eval_batch_size})"
                    f" must divide by the '{data_axis}' axis ({data_n})")

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, sh) if mesh is not None else x

    def put_idx(x):
        """(K, steps, B) index/mask arrays: fold-sharded, and batch-sharded
        over the data axis when fold x DP 2-D parallelism is on."""
        x = jnp.asarray(x)
        if mesh is None:
            return x
        return jax.device_put(x, idx_sh if data_n > 1 else sh)

    def maybe_aot(fn, tag):
        # disk-backed executable cache (io/aot_cache.py): THE payoff driver
        # for fold-parallel on remote-compile links — its vmapped epoch/eval
        # programs are the most expensive compiles in the repo (round-2
        # measured: fresh compiles made fold-parallel lose end-to-end
        # despite a 2.2x steady-state win). One instance per run: the
        # signature does not encode shardings (AOTCachedFunction docstring).
        if not aot_cache_dir:
            return fn
        from ..io.aot_cache import AOTCachedFunction

        return AOTCachedFunction(
            fn, aot_cache_dir, tag=tag,
            extra_meta={"driver": "cv_parallel", "model": cfg.name,
                        "batch_size": cfg.batch_size, "k_pad": k_pad})

    if streaming:
        train_fn = maybe_aot(_build_parallel_train_step(trainer),
                             "par_train_step")
        eval_step_fn = maybe_aot(_build_parallel_eval_step(trainer),
                                 "par_eval_step")
    else:
        train_fn = maybe_aot(_build_parallel_train_epoch(trainer),
                             "par_train_epoch")
        eval_fn = maybe_aot(_build_parallel_eval(trainer), "par_eval")

    # host-side per-fold bookkeeping, mirroring the sequential driver
    shuffle_rngs = [np.random.default_rng(cfg.seed + f)
                    for f in range(1, k_pad + 1)]
    dropout_keys = jnp.stack(
        [jax.random.PRNGKey(cfg.seed * 1000 + f)
         for f in range(1, k_pad + 1)])
    plateaus = [ReduceLROnPlateau(lr=cfg.learning_rate)
                for _ in range(k_pad)]
    lrs = np.full(k_pad, cfg.learning_rate, np.float64)

    train_rows = [s[0] for s in padded_splits]
    val_rows = [s[1] for s in padded_splits]
    # eval indices are epoch-invariant: build (+ place, device-resident mode)
    # once
    eidx_h, ebv_h = _stack_fold_indices(
        val_rows, tcfg.eval_batch_size, [None] * k_pad)
    if not streaming:
        eidx, ebv = put_idx(eidx_h), put_idx(ebv_h)

    total_steps = 0

    def stacked_batch_sharding():
        if mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(
            mesh, P(fold_axis, data_axis) if data_n > 1 else P(fold_axis))

    def run_stacked_epoch(fn, st, keys, lr_vec):
        nonlocal total_steps
        idx, bv = _stack_fold_indices(
            train_rows, cfg.batch_size, shuffle_rngs)
        # count REAL folds only: padded dummy folds (k_pad > n_folds) compute
        # but must not inflate the logged steps/s
        total_steps += int(bv[:n_folds].max(axis=2).sum())
        if streaming:
            return _run_streaming_epoch(fn, st, keys, lr_vec, idx, bv)
        st, losses = fn(st, data, put_idx(idx), put_idx(bv),
                        put(np.asarray(keys)),
                        put(np.asarray(lr_vec, np.float32)))
        return st, losses

    def _run_streaming_epoch(fn, st, keys, lr_vec, idx, bv):
        """Per-step dispatch of stacked (K, B, ...) host-gathered batches,
        double-buffered onto the device. Same key chain + whole-step masking
        as the scan epoch (=> identical trajectories)."""
        from ..data.pipeline import BatchPrefetcher

        steps = idx.shape[1]
        step_valid = (bv.max(axis=2) > 0)  # (K, steps)

        def host_batches():
            for s in range(steps):
                b = {k: v[idx[:, s]] for k, v in host_data.items()}
                b["valid"] = bv[:, s]
                b["svalid"] = b["svalid"] * bv[:, s]
                yield b

        keys_dev = put(np.asarray(keys))
        lrs_dev = put(np.asarray(lr_vec, np.float32))
        losses = []
        for s, batch in enumerate(BatchPrefetcher(
                host_batches(), depth=2, sharding=stacked_batch_sharding())):
            st, keys_dev, loss = fn(st, batch, lrs_dev, keys_dev,
                                    put(step_valid[:, s]))
            losses.append(loss)
        # ONE readback fences the epoch (in-order execution); per-fold mean
        # over VALID steps only
        stacked = np.asarray(jnp.stack(losses))  # (steps, K)
        n_valid = np.maximum(step_valid.sum(axis=1), 1)
        return st, jnp.asarray(stacked.sum(axis=0) / n_valid)

    def run_stacked_eval(st):
        """(K,) pooled C-index + (K,) mean val loss, either mode."""
        if not streaming:
            return eval_fn(st.params, st.batch_stats, data, eidx, ebv)
        from ..data.pipeline import BatchPrefetcher
        from ..ops.cindex import concordance_index

        steps = eidx_h.shape[1]

        def host_batches():
            for s in range(steps):
                b = {k: v[eidx_h[:, s]] for k, v in host_data.items()}
                b["valid"] = ebv_h[:, s]
                b["svalid"] = b["svalid"] * ebv_h[:, s]
                yield b

        hazards, losses = [], []
        for batch in BatchPrefetcher(host_batches(), depth=2,
                                     sharding=stacked_batch_sharding()):
            h, loss = eval_step_fn(st.params, st.batch_stats, batch)
            hazards.append(h)
            losses.append(loss)
        from ..parallel.multihost import read_back

        h = np.stack([read_back(x) for x in hazards])  # (steps, K, B)
        step_valid = (ebv_h.max(axis=2) > 0)  # (K, steps)
        losses = np.asarray(jnp.stack(losses))  # (steps, K)
        vloss = losses.T.sum(axis=1) / np.maximum(step_valid.sum(axis=1), 1)

        if not hasattr(run_stacked_eval, "_cindex"):
            run_stacked_eval._cindex = jax.jit(concordance_index)
        cidx = np.zeros(k_pad)
        for k in range(k_pad):
            hk = h[:, k, :].reshape(-1).astype(np.float32)
            flat = eidx_h[k].reshape(-1)
            bvk = ebv_h[k].reshape(-1)
            t = host_data["time"][flat].astype(np.float32)
            e = host_data["event"][flat].astype(np.float32)
            sv = (host_data["svalid"][flat] * bvk).astype(np.float32)
            bucket = max(512, -(-hk.size // 512) * 512)
            pad = bucket - hk.size
            if pad:
                z = np.zeros(pad, np.float32)
                hk, t, e, sv = (np.concatenate([a, z])
                                for a in (hk, t, e, sv))
            cidx[k] = float(run_stacked_eval._cindex(hk, t, e, sv))
        return jnp.asarray(cidx), jnp.asarray(vloss)

    # ---- stage 1 (SimMLM expert pretraining): fixed LR, no selection ----
    if cfg.stage1_epochs:
        from .adapters import simmlm_stage1_adapter

        s1_trainer = Trainer(model, batch_to_inputs,
                             simmlm_stage1_adapter(), tcfg)
        s1_trainer._extra_collections = trainer._extra_collections
        s1_fn = (maybe_aot(_build_parallel_train_step(s1_trainer),
                           "par_stage1_step") if streaming else
                 maybe_aot(_build_parallel_train_epoch(s1_trainer),
                           "par_stage1_epoch"))
        for epoch in range(1, cfg.stage1_epochs + 1):
            split = jax.vmap(jax.random.split)(dropout_keys)
            dropout_keys, eks = split[:, 0], split[:, 1]
            state, s1_loss = run_stacked_epoch(
                s1_fn, state, eks, np.full(k_pad, cfg.learning_rate))
            if epoch % 10 == 0 or epoch == 1:
                log.info("[%s parallel] stage1 epoch %d mean loss %.4f",
                         name, epoch, float(jnp.mean(s1_loss)))

    # ---- main epochs: all folds advance together, records per fold ----
    best_c = np.full(k_pad, -np.inf)
    best_epoch = np.zeros(k_pad, np.int64)
    best_params: list = [None] * k_pad
    bad = np.zeros(k_pad, np.int64)
    histories: list[list] = [[] for _ in range(k_pad)]
    epochs_run = np.zeros(k_pad, np.int64)
    active = np.array([f < n_folds for f in range(k_pad)])

    def snapshot(fold_i):
        sel = {"params": state.params, "batch_stats": state.batch_stats}
        # fetch_tree: multihost-safe device_get (a multi-process fold mesh
        # leaves the indexed slice on the fold's owning devices; every
        # process takes identical snapshot branches — replicated eval)
        from ..parallel.multihost import fetch_tree

        return fetch_tree(jax.tree_util.tree_map(lambda x: x[fold_i], sel))

    for epoch in range(1, num_epochs + 1):
        if not active.any():
            break
        if cfg.scheduler == "cosine":
            lrs[:] = cosine_annealing(cfg.learning_rate, epoch - 1,
                                      num_epochs)
        split = jax.vmap(jax.random.split)(dropout_keys)
        dropout_keys, eks = split[:, 0], split[:, 1]
        state, tr_losses = run_stacked_epoch(train_fn, state, eks, lrs)
        cidx, vloss = run_stacked_eval(state)
        # ONE readback fences the epoch's dispatches (in-order execution)
        tr_losses, cidx, vloss = (np.asarray(tr_losses), np.asarray(cidx),
                                  np.asarray(vloss))

        improved = []
        for k in range(n_folds):
            if not active[k]:
                continue
            val_c = float(cidx[k])
            if cfg.scheduler == "plateau":
                lrs[k] = plateaus[k].step(val_c)
            histories[k].append(dict(
                epoch=epoch, train_loss=float(tr_losses[k]),
                val_loss=float(vloss[k]), val_c_index=val_c,
                lr=float(lrs[k])))
            epochs_run[k] = epoch
            if val_c > best_c[k]:
                best_c[k], best_epoch[k] = val_c, epoch
                best_params[k] = snapshot(k)
                bad[k] = 0
                improved.append(k)
            else:
                bad[k] += 1
            if cfg.patience is not None and bad[k] >= cfg.patience:
                active[k] = False
                log.info("[%s parallel fold %d] early stop at epoch %d",
                         name, k + 1, epoch)
        if epoch % 10 == 0 or epoch == 1:
            log.info("[%s parallel] epoch %d mean val C %.4f (%d active)",
                     name, epoch, float(cidx[:n_folds].mean()),
                     int(active.sum()))

    # ---- outcomes + artifacts (schema identical to the sequential driver) --
    outcomes: list[FoldOutcome] = []
    for k in range(n_folds):
        tr, va, tss = splits[k]
        if write_outputs and best_params[k] is not None:
            ckpt_path = Path(models_dir) / name / f"fold_{k + 1}_best.msgpack"
            save_checkpoint(ckpt_path, best_params[k])
            save_fold_meta(
                ckpt_path, model=name, fold=k + 1, backbone=backbone,
                image_shape=list(cfg.image_shape), rna_dim=rna_dim,
                hu_window=(list(hu_window) if hu_window else None),
                use_pallas_resample=use_pallas_resample, ties=cfg.ties,
                resample_mode=getattr(arrays, "ingest_mode", None),
                best_epoch=int(best_epoch[k]), best_c_index=float(best_c[k]))
        outcomes.append(FoldOutcome(
            fold=k + 1, best_c_index=float(best_c[k]),
            best_epoch=int(best_epoch[k]), train_size=len(tr),
            val_size=len(va), train_survival_size=tss,
            epochs_run=int(epochs_run[k]), history=histories[k]))
        log.info("[%s parallel fold %d] best C-index %.4f @ epoch %d",
                 name, k + 1, best_c[k], best_epoch[k])

    elapsed = _time.monotonic() - t_start
    payload = build_and_write_cv_payload(
        cfg, outcomes, num_epochs, int(arrays.n), results_dir,
        write_outputs=write_outputs)
    log.info("[%s parallel] CV done: %.1fs, %d steps (%d folds in flight), "
             "%.2f steps/s", name, elapsed, total_steps, k_pad,
             total_steps / max(elapsed, 1e-9))
    return payload, outcomes
