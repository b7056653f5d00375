"""Vmapped hyperparameter sweep: many (seed, learning-rate) candidates
trained SIMULTANEOUSLY on one fold split.

The reference tunes hyperparameters by editing module-level constants and
re-running whole scripts serially (SURVEY §2.11). On TPU the marginal cost
of more candidates is ~zero until the MXU saturates: candidate states are
stacked on a leading axis, the whole-epoch ``lax.scan`` is vmapped over it
(same machinery as fold-parallel CV, train/cv_parallel.py), and the axis is
sharded over a device mesh. Seeds vary through per-candidate init/shuffle/
dropout RNG chains; learning rates vary through the host-fed per-step LR
scalar (train/engine.py ``_scaled_by_host_lr``) — neither causes a retrace,
so R candidates compile ONCE.

Fidelity anchor: a candidate with ``seed == cfg.seed`` and
``lr == cfg.learning_rate`` reproduces the sequential CV driver's fold-1
trajectory exactly (same RNG-chain construction; tested in
tests/test_sweep.py). Candidates that only differ in weight decay or
optimizer family need separate sweeps (those are baked into the compiled
optimizer).
"""

from __future__ import annotations

import json
import logging
import time as _time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..config import ModelRunConfig
from .adapters import make_model_and_adapters
from .cv import prepare_cv_data
from .cv_parallel import (
    _build_parallel_eval,
    _build_parallel_train_epoch,
    _fold_sharding,
    _stack_fold_indices,
    _stack_states,
    assert_extras_invariant,
)
from .engine import TrainConfig, Trainer
from .schedules import ReduceLROnPlateau, cosine_annealing

log = logging.getLogger(__name__)


def run_hyperparameter_sweep(
    cfg: ModelRunConfig,
    table: pd.DataFrame,
    rnaseq_csv=None,
    seeds=(42,),
    learning_rates=None,
    fold: int = 1,
    mesh=None,
    fold_axis: str = "fold",
    backbone: str = "densenet121",
    dtype=None,
    remat: bool = False,
    num_epochs: int | None = None,
    results_dir=None,
    use_pallas_resample: bool = False,
    hu_window=None,
):
    """Train every (seed, lr) candidate in parallel on fold `fold`'s split.

    Args:
      seeds: init/shuffle/dropout seeds to sweep.
      learning_rates: base LRs to sweep (default: just cfg.learning_rate).
      fold: which seed-42 KFold split supplies train/val rows (1-based).
      mesh: optional 1-D mesh (cv_parallel.make_fold_mesh) to shard the
        candidate axis over.

    Returns a leaderboard: list of dicts sorted by best val C-index desc,
    each {seed, learning_rate, best_c_index, best_epoch, history}.
    """
    num_epochs = num_epochs or cfg.num_epochs
    learning_rates = list(learning_rates or [cfg.learning_rate])
    points = [(s, lr) for s in seeds for lr in learning_rates]
    n_points = len(points)

    arrays, splits = prepare_cv_data(
        cfg, table, rnaseq_csv=rnaseq_csv,
        use_pallas_resample=use_pallas_resample, hu_window=hu_window)
    train_rows, val_rows, _ = splits[fold - 1]
    rna_dim = arrays.arrays["rnaseq"].shape[1]

    shard_n = dict(mesh.shape).get(fold_axis, 1) if mesh is not None else 1
    k_pad = -(-n_points // shard_n) * shard_n
    padded_points = points + [points[-1]] * (k_pad - n_points)

    model, batch_to_inputs, hazard_and_aux = make_model_and_adapters(
        cfg, rna_dim=rna_dim, backbone=backbone, dtype=dtype, remat=remat)
    tcfg = TrainConfig(
        batch_size=cfg.batch_size, learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay, optimizer=cfg.optimizer,
        grad_clip=cfg.grad_clip, seed=cfg.seed, ties=cfg.ties)
    trainer = Trainer(model, batch_to_inputs, hazard_and_aux, tcfg)

    data = arrays.to_device(mesh=mesh)
    example = {k: v[:cfg.batch_size] for k, v in data.items()}
    example["valid"] = example["svalid"]

    t_start = _time.monotonic()
    states, extras_ref = [], None
    for s, _ in padded_points:
        states.append(trainer.init_state(example, fold=fold, seed=s))
        extras = jax.device_get(trainer._extra_collections)
        if extras_ref is None:
            extras_ref = extras
        else:
            assert_extras_invariant(extras_ref, extras, f"seed {s}")
    state = _stack_states(states)
    del states
    if mesh is not None:
        sh = _fold_sharding(mesh, fold_axis)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), state)

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, sh) if mesh is not None else x

    train_fn = _build_parallel_train_epoch(trainer)
    eval_fn = _build_parallel_eval(trainer)

    shuffle_rngs = [np.random.default_rng(s + fold)
                    for s, _ in padded_points]
    dropout_keys = jnp.stack([jax.random.PRNGKey(s * 1000 + fold)
                              for s, _ in padded_points])
    base_lrs = np.asarray([lr for _, lr in padded_points], np.float64)
    plateaus = [ReduceLROnPlateau(lr=lr) for lr in base_lrs]
    lrs = base_lrs.copy()

    eidx, ebv = _stack_fold_indices(
        [val_rows] * k_pad, tcfg.eval_batch_size, [None] * k_pad)
    eidx, ebv = put(eidx), put(ebv)

    # stage 1 (SimMLM expert pretraining): fixed LR, no selection — the same
    # pre-phase both real CV drivers run (cv.py / cv_parallel.py), so swept
    # candidates see the regime run_cross_validation would give them
    if cfg.stage1_epochs:
        from .adapters import simmlm_stage1_adapter

        s1_trainer = Trainer(model, batch_to_inputs,
                             simmlm_stage1_adapter(), tcfg)
        s1_trainer._extra_collections = trainer._extra_collections
        s1_fn = _build_parallel_train_epoch(s1_trainer)
        for epoch in range(1, cfg.stage1_epochs + 1):
            split = jax.vmap(jax.random.split)(dropout_keys)
            dropout_keys, eks = split[:, 0], split[:, 1]
            idx, bv = _stack_fold_indices(
                [train_rows] * k_pad, cfg.batch_size, shuffle_rngs)
            state, s1_loss = s1_fn(
                state, data, put(idx), put(bv), put(np.asarray(eks)),
                # per-candidate BASE lr: run_cross_validation's stage 1 uses
                # cfg.learning_rate, which for a swept (seed, lr) candidate
                # IS that candidate's lr (fixed — no schedule in stage 1)
                put(np.asarray(base_lrs, np.float32)))
            if epoch % 10 == 0 or epoch == 1:
                log.info("[%s sweep] stage1 epoch %d mean loss %.4f",
                         cfg.name, epoch, float(jnp.mean(s1_loss)))

    best_c = np.full(k_pad, -np.inf)
    best_epoch = np.zeros(k_pad, np.int64)
    histories: list[list] = [[] for _ in range(k_pad)]
    bad = np.zeros(k_pad, np.int64)
    # early-stop parity with the sequential driver: once a candidate exceeds
    # cfg.patience epochs without improvement its record freezes (later
    # improvements the sequential driver would never have seen are ignored);
    # compute still advances vmapped until every candidate has stopped
    active = np.ones(k_pad, bool)

    for epoch in range(1, num_epochs + 1):
        if not active[:n_points].any():
            break
        if cfg.scheduler == "cosine":
            lrs = np.asarray([
                cosine_annealing(b, epoch - 1, num_epochs)
                for b in base_lrs])
        split = jax.vmap(jax.random.split)(dropout_keys)
        dropout_keys, eks = split[:, 0], split[:, 1]
        idx, bv = _stack_fold_indices(
            [train_rows] * k_pad, cfg.batch_size, shuffle_rngs)
        state, tr_losses = train_fn(
            state, data, put(idx), put(bv), put(np.asarray(eks)),
            put(np.asarray(lrs, np.float32)))
        cidx, vloss = eval_fn(state.params, state.batch_stats, data,
                              eidx, ebv)
        tr_losses, cidx, vloss = (np.asarray(tr_losses), np.asarray(cidx),
                                  np.asarray(vloss))
        for k in range(n_points):
            if not active[k]:
                continue
            val_c = float(cidx[k])
            if cfg.scheduler == "plateau":
                lrs[k] = plateaus[k].step(val_c)
            histories[k].append(dict(
                epoch=epoch, train_loss=float(tr_losses[k]),
                val_loss=float(vloss[k]), val_c_index=val_c,
                lr=float(lrs[k])))
            if val_c > best_c[k]:
                best_c[k], best_epoch[k] = val_c, epoch
                bad[k] = 0
            else:
                bad[k] += 1
                if cfg.patience is not None and bad[k] >= cfg.patience:
                    active[k] = False
        if epoch % 10 == 0 or epoch == 1:
            log.info("[%s sweep] epoch %d best-so-far %.4f", cfg.name,
                     epoch, float(best_c[:n_points].max()))

    leaderboard = sorted(
        (dict(seed=s, learning_rate=lr, best_c_index=float(best_c[k]),
              best_epoch=int(best_epoch[k]), history=histories[k])
         for k, (s, lr) in enumerate(points)),
        key=lambda r: -r["best_c_index"])
    elapsed = _time.monotonic() - t_start
    log.info("[%s sweep] %d candidates x %d epochs in %.1fs; top: seed=%d "
             "lr=%g C=%.4f", cfg.name, n_points, num_epochs, elapsed,
             leaderboard[0]["seed"], leaderboard[0]["learning_rate"],
             leaderboard[0]["best_c_index"])
    if results_dir is not None:
        out = Path(results_dir) / cfg.name / "sweep_results.json"
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps({
            "model": cfg.display_name, "fold": fold,
            "num_epochs": num_epochs,
            "candidates": [{k: v for k, v in r.items() if k != "history"}
                           for r in leaderboard]}, indent=2))
    return leaderboard
