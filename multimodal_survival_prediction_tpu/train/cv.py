"""K-fold cross-validation driver.

Reproduces the reference training loop's control flow exactly (SURVEY §2.6):
sklearn KFold(n_splits, shuffle=True, random_state=42) over the patient list
(sklearn on host for bit-identical splits), per-epoch train + pooled-val
C-index, ReduceLROnPlateau/cosine schedule, best-checkpoint-on-val-C-index,
early stop after `patience` epochs without improvement, and the
partial-modality trick of folding ALL unlabeled patients into every fold's
train set (reference partial_modality_training.py:502-515).
"""

from __future__ import annotations

import logging
import time as _time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import numpy as np
import pandas as pd
from sklearn.model_selection import KFold

from ..config import ModelRunConfig
from ..data.datasets import (
    build_cohort_arrays,
    load_rnaseq_matrix,
    select_cohort,
)
from ..io.checkpoint import save_checkpoint, save_fold_meta
from ..io.results import write_cv_results
from .adapters import make_model_and_adapters
from .engine import TrainConfig, Trainer
from .schedules import ReduceLROnPlateau, cosine_annealing

log = logging.getLogger(__name__)


def _state_dict(state):
    """TrainState -> plain dict (flax msgpack can't serialize the custom
    pytree dataclass directly)."""
    return {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}


@dataclass
class FoldOutcome:
    fold: int
    best_c_index: float
    best_epoch: int
    train_size: int
    val_size: int
    train_survival_size: int | None = None
    epochs_run: int = 0
    history: list = field(default_factory=list)


def prepare_cv_data(cfg: ModelRunConfig, table: pd.DataFrame, rnaseq_csv=None,
                    use_pallas_resample: bool = False, hu_window=None,
                    resample: str | None = None):
    """Cohort selection + array build + seed-42 KFold splits.

    Shared by the sequential driver below and the fold-parallel driver
    (cv_parallel.py) so both see bit-identical cohorts and splits.

    Returns (arrays, splits) where splits is a list of
    (train_rows, val_rows, train_survival_size_or_None) — with the
    partial-modality trick applied: ALL unlabeled patients appended to every
    fold's train set (reference partial_modality_training.py:502-515).
    """
    name = cfg.name
    cohort = select_cohort(table, name)
    rnaseq_df = None
    if "rnaseq" in cfg.modalities and rnaseq_csv is not None:
        rnaseq_df = load_rnaseq_matrix(rnaseq_csv)
        if name == "rnaseq_only":
            # reference intersects with the matrix index
            # (train_rnaseq_only.py:239); order kept deterministic (sorted)
            keep = cohort.patient_id.isin(set(rnaseq_df.index))
            cohort = cohort[keep]

    arrays = build_cohort_arrays(
        cohort, rnaseq_df, with_image="image" in cfg.modalities,
        image_shape=cfg.image_shape, use_pallas=use_pallas_resample,
        hu_window=hu_window, resample=resample,
    )

    # Survival-labeled vs unlabeled split (partial-modality fold trick)
    svalid = arrays.arrays["svalid"] > 0
    labeled_rows = np.nonzero(svalid)[0]
    unlabeled_rows = np.nonzero(~svalid)[0]
    # Non-partial models select only labeled patients at the cohort level, so
    # their fold universe is every row; partial_modality folds over labeled
    # rows only and appends the unlabeled to each train set below.
    fold_rows = (labeled_rows if cfg.include_unlabeled_in_train
                 else np.arange(arrays.n))

    kfold = KFold(n_splits=cfg.n_folds, shuffle=True, random_state=cfg.seed)
    splits = []
    for tr_idx, va_idx in kfold.split(fold_rows):
        train_rows = fold_rows[tr_idx]
        val_rows = fold_rows[va_idx]
        train_survival_size = None
        if cfg.include_unlabeled_in_train:
            train_survival_size = len(train_rows)
            train_rows = np.concatenate([train_rows, unlabeled_rows])
        splits.append((train_rows, val_rows, train_survival_size))
    return arrays, splits


def run_cross_validation(
    cfg: ModelRunConfig,
    table: pd.DataFrame,
    rnaseq_csv=None,
    results_dir="results",
    models_dir="models",
    mesh=None,
    tensor_parallel: bool = False,
    backbone: str = "densenet121",
    dtype=None,
    remat: bool = False,
    use_pallas_resample: bool = False,
    hu_window=None,
    num_epochs: int | None = None,
    write_outputs: bool = True,
    profile_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 10,
    prepared=None,
    streaming: bool = False,
    sharded_risk_set: bool = False,
    aot_cache_dir=None,
    init_hook=None,
):
    """Full CV run for one model config. Returns (payload, fold_outcomes).

    `prepared`: optional (arrays, splits) from a prior prepare_cv_data call
    with the same cfg — skips re-decoding/resampling the cohort when the
    caller already built it (e.g. the twin-run parity harness feeds the
    identical array set to both the torch oracle and this driver).

    `streaming`: keep the cohort on HOST and double-buffer batches onto the
    device (Trainer.train_epoch_streaming / evaluate_streaming) — for cohorts
    whose arrays exceed HBM. Same trajectory as the default device-resident
    scan path (identical batch order + per-step dropout-key chain,
    tests/test_train_e2e.py::test_streaming_epoch_matches_scan_epoch); the
    scan path is faster whenever the data fits.

    `init_hook`: optional callable ``(fold, state) -> state | None`` applied
    right after each fold's ``init_state`` — returning a (possibly modified)
    TrainState replaces the fold's initial state; returning None keeps it.
    Used by the init-matched parity harness to capture (or substitute) each
    fold's exact initial weights so the torch oracle can start from
    IDENTICAL initial parameters (run_parity_flagship_initmatched.py)."""
    name = cfg.name
    num_epochs = num_epochs or cfg.num_epochs

    # Multi-host: every process runs the identical driver loop (all control
    # decisions derive from replicated device values), but only the
    # coordinator writes shared artifacts (parallel/multihost.py).
    from ..parallel.multihost import fetch_tree, is_coordinator

    write_outputs = write_outputs and is_coordinator()

    arrays, splits = prepared if prepared is not None else prepare_cv_data(
        cfg, table, rnaseq_csv=rnaseq_csv,
        use_pallas_resample=use_pallas_resample, hu_window=hu_window)
    rna_dim = arrays.arrays["rnaseq"].shape[1]

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

    if streaming:
        # cohort stays host-resident (numpy); batches stream through
        # BatchPrefetcher inside the Trainer streaming methods
        data = {k: np.asarray(v) for k, v in arrays.arrays.items()}
    else:
        data = arrays.to_device(mesh=mesh)

    outcomes: list[FoldOutcome] = []
    t_start = _time.monotonic()
    total_steps = 0

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # ONE Trainer for all folds: its jitted epoch/eval executables are traced
    # once and reused across folds (the reference re-creates everything per
    # fold; recompiling 5x would waste minutes of TPU time for nothing).
    trainer = Trainer(model, batch_to_inputs, hazard_and_aux, tcfg, mesh=mesh,
                      tensor_parallel=tensor_parallel,
                      sharded_risk_set=sharded_risk_set,
                      aot_cache_dir=aot_cache_dir)
    stage1_trainer = None
    if cfg.stage1_epochs:
        from .adapters import simmlm_stage1_adapter

        stage1_trainer = Trainer(model, batch_to_inputs,
                                 simmlm_stage1_adapter(), tcfg, mesh=mesh,
                                 tensor_parallel=tensor_parallel,
                                 sharded_risk_set=sharded_risk_set,
                                 aot_cache_dir=aot_cache_dir)
    example = {k: v[:cfg.batch_size] for k, v in data.items()}
    example["valid"] = example["svalid"]

    def train_one_epoch(tr, st, rows, srng, lr_, key):
        if streaming:
            return tr.train_epoch_streaming(st, data, rows, srng, lr_, key)
        return tr.train_epoch(st, data, rows, srng, lr_, key)

    def eval_rows(st, rows):
        if streaming:
            return trainer.evaluate_streaming(st, data, rows)
        return trainer.evaluate(st, data, rows)

    for fold, (train_rows, val_rows, train_survival_size) in enumerate(
            splits, start=1):
        state = trainer.init_state(example, fold=fold)
        if init_hook is not None:
            state = init_hook(fold, state) or state

        shuffle_rng = np.random.default_rng(cfg.seed + fold)
        dropout_key = jax.random.PRNGKey(cfg.seed * 1000 + fold)
        plateau = ReduceLROnPlateau(lr=cfg.learning_rate)
        lr = cfg.learning_rate

        # ---- resume (full-state, a capability the reference lacks:
        #      SURVEY §5 — it only keeps best weights, no optimizer/RNG) ----
        resume_dir = Path(models_dir) / name / f"fold_{fold}_resume"
        start_epoch = 1
        resumed_meta = None
        if resume and (resume_dir / "progress.json").exists():
            import json as _json

            from ..io.checkpoint import load_checkpoint

            resumed_meta = _json.loads(
                (resume_dir / "progress.json").read_text())
            from .engine import TrainState as _TS

            sd = load_checkpoint(resume_dir / "state.msgpack",
                                 _state_dict(fetch_tree(state)))
            restored = _TS(**sd)
            if mesh is not None:
                # restore each leaf onto the sharding its pre-resume
                # counterpart had (TP kernels back onto the 'model' axis,
                # replicated leaves replicated) — a plain replicate() here
                # would silently drop tensor parallelism after resume.
                # Leaves whose originals were uncommitted single-device
                # arrays (e.g. scalar optimizer counters) stay uncommitted:
                # committing them to one device would conflict with the
                # mesh-sharded leaves under jit.
                from jax.sharding import NamedSharding as _NS

                def _restore_leaf(new, old):
                    sh = getattr(old, "sharding", None)
                    if isinstance(sh, _NS):
                        return jax.device_put(new, sh)
                    return jax.numpy.asarray(new)

                state = jax.tree_util.tree_map(_restore_leaf, restored, state)
            else:
                state = restored
            shuffle_rng = np.random.default_rng()
            shuffle_rng.bit_generator.state = resumed_meta["shuffle_rng"]
            dropout_key = jax.numpy.asarray(
                np.asarray(resumed_meta["dropout_key"], np.uint32))
            lr = resumed_meta["lr"]
            plateau.lr = resumed_meta["lr"]
            plateau.best = resumed_meta["plateau_best"]
            plateau.num_bad = resumed_meta["plateau_num_bad"]
            start_epoch = resumed_meta["epoch"] + 1
            log.info("[%s fold %d] resumed at epoch %d", name, fold,
                     start_epoch)

        def save_resume(epoch, best_c, best_epoch, bad, history):
            import json as _json

            # Coordinator-only on multi-host (every process holds the same
            # replicated state; a shared FS wants one writer). The barrier —
            # reached by EVERY process — keeps non-coordinators from racing
            # past a checkpoint other hosts may later resume-read.
            from ..parallel.multihost import barrier

            # fetch_tree BEFORE the coordinator gate: under cross-process
            # TP the allgather is collective — every process participates
            sd = _state_dict(fetch_tree(state))
            if is_coordinator():
                save_checkpoint(resume_dir / "state.msgpack", sd)
                if best_params is not None:
                    save_checkpoint(resume_dir / "best.msgpack", best_params)
                (resume_dir / "progress.json").write_text(_json.dumps({
                    "epoch": epoch, "lr": lr,
                    "plateau_best": plateau.best,
                    "plateau_num_bad": plateau.num_bad,
                    "best_c": best_c, "best_epoch": best_epoch, "bad": bad,
                    "shuffle_rng": shuffle_rng.bit_generator.state,
                    "dropout_key": np.asarray(dropout_key).tolist(),
                    "history": history,
                }, default=str))
            barrier("resume-save")

        # stage 1 (SimMLM expert pretraining): no model selection, fixed LR.
        # Skipped on resume: stage 1 already ran before the first stage-2
        # checkpoint, so re-running it would corrupt the restored trajectory
        # and burn extra shuffle-RNG draws.
        if stage1_trainer is not None and resumed_meta is None:
            stage1_trainer._extra_collections = trainer._extra_collections
            for epoch in range(1, cfg.stage1_epochs + 1):
                dropout_key, ek = jax.random.split(dropout_key)
                state, s1_loss = train_one_epoch(
                    stage1_trainer, state, train_rows, shuffle_rng,
                    cfg.learning_rate, ek)
                if epoch % 10 == 0 or epoch == 1:
                    log.info("[%s fold %d] stage1 epoch %d loss %.4f",
                             name, fold, epoch, s1_loss)
                total_steps += -(-len(train_rows) // cfg.batch_size)

        best_c, best_epoch, best_params, bad = -np.inf, 0, None, 0
        history = []
        epochs_run = 0
        if resumed_meta is not None:
            best_c = resumed_meta["best_c"]
            best_epoch = resumed_meta["best_epoch"]
            bad = resumed_meta["bad"]
            history = resumed_meta["history"]
            epochs_run = resumed_meta["epoch"]
            if (resume_dir / "best.msgpack").exists():
                from ..io.checkpoint import load_checkpoint

                best_params = load_checkpoint(
                    resume_dir / "best.msgpack",
                    fetch_tree({"params": state.params,
                                "batch_stats": state.batch_stats}))
        for epoch in range(start_epoch, num_epochs + 1):
            if cfg.scheduler == "cosine":
                lr = cosine_annealing(cfg.learning_rate, epoch - 1, num_epochs)
            dropout_key, ek = jax.random.split(dropout_key)
            state, tr_loss = train_one_epoch(
                trainer, state, train_rows, shuffle_rng, lr, ek)
            val_c, val_loss, _ = eval_rows(state, val_rows)
            if cfg.scheduler == "plateau":
                lr = plateau.step(val_c)
            history.append(dict(epoch=epoch, train_loss=tr_loss,
                                val_loss=val_loss, val_c_index=val_c, lr=lr))
            epochs_run = epoch
            total_steps += -(-len(train_rows) // cfg.batch_size)

            if val_c > best_c:
                best_c, best_epoch = val_c, epoch
                # multihost-safe device_get: TP kernels may span processes
                best_params = fetch_tree(
                    {"params": state.params,
                     "batch_stats": state.batch_stats})
                bad = 0
            else:
                bad += 1
            if cfg.patience is not None and bad >= cfg.patience:
                log.info("[%s fold %d] early stop at epoch %d", name, fold,
                         epoch)
                break
            if epoch % 10 == 0 or epoch == 1:
                log.info("[%s fold %d] epoch %d loss %.4f val C %.4f",
                         name, fold, epoch, tr_loss, val_c)
            if resume and checkpoint_every and epoch % checkpoint_every == 0:
                save_resume(epoch, best_c, best_epoch, bad, history)

        if write_outputs and best_params is not None:
            ckpt_path = Path(models_dir) / name / f"fold_{fold}_best.msgpack"
            save_checkpoint(ckpt_path, best_params)
            save_fold_meta(
                ckpt_path, model=name, fold=fold, backbone=backbone,
                image_shape=list(cfg.image_shape), rna_dim=rna_dim,
                hu_window=(list(hu_window) if hu_window else None),
                use_pallas_resample=use_pallas_resample, ties=cfg.ties,
                resample_mode=getattr(arrays, "ingest_mode", None),
                best_epoch=best_epoch, best_c_index=float(best_c))

        outcome = FoldOutcome(
            fold=fold, best_c_index=float(best_c), best_epoch=best_epoch,
            train_size=len(train_rows), val_size=len(val_rows),
            train_survival_size=train_survival_size, epochs_run=epochs_run,
            history=history)
        outcomes.append(outcome)
        log.info("[%s fold %d] best C-index %.4f @ epoch %d", name, fold,
                 best_c, best_epoch)

    if profile_dir:
        jax.profiler.stop_trace()

    elapsed = _time.monotonic() - t_start
    payload = build_and_write_cv_payload(
        cfg, outcomes, num_epochs, int(arrays.n), results_dir,
        write_outputs=write_outputs)
    log.info("[%s] CV done: %.1fs, %d steps, %.2f steps/s", name, elapsed,
             total_steps, total_steps / max(elapsed, 1e-9))
    return payload, outcomes


def build_and_write_cv_payload(cfg, outcomes, num_epochs, dataset_size,
                               results_dir, write_outputs=True):
    """fold_results + reference-schema hyperparameters -> write_cv_results.

    Shared verbatim by the sequential driver above and the fold-parallel
    driver (cv_parallel.py) so their advertised schema-identical results
    files cannot drift (they were previously two copy-pasted blocks)."""
    fold_results = []
    for o in outcomes:
        fr = {"fold": o.fold, "best_c_index": o.best_c_index,
              "best_epoch": o.best_epoch, "train_size": o.train_size,
              "val_size": o.val_size}
        if o.train_survival_size is not None:
            fr["train_survival_size"] = o.train_survival_size
        fold_results.append(fr)

    hyper = {
        "batch_size": cfg.batch_size,
        "learning_rate": cfg.learning_rate,
    }
    if cfg.stage1_epochs:
        # SimMLM variant keys (reference results/simmim/cv_results.json)
        hyper["stage1_epochs"] = cfg.stage1_epochs
        hyper["stage2_epochs"] = num_epochs
    else:
        hyper["epochs"] = num_epochs
    hyper["n_folds"] = cfg.n_folds
    if cfg.gate_entropy_weight:
        hyper["gate_entropy_weight"] = cfg.gate_entropy_weight
    if cfg.mofe_lambda:
        hyper["mofe_lambda"] = cfg.mofe_lambda

    extra = {"n_folds": cfg.n_folds, "num_epochs": num_epochs,
             "dataset_size": dataset_size}
    if not write_outputs:
        # same payload the file would carry — multihost non-coordinators and
        # write_outputs=False callers get identical return values
        from ..io.results import build_cv_payload

        return build_cv_payload(
            cfg.display_name, fold_results, hyperparameters=hyper,
            extra=extra, legacy=(cfg.name == "image_only"))
    return write_cv_results(
        Path(results_dir) / cfg.name, cfg.display_name, fold_results,
        hyperparameters=hyper, extra=extra,
        legacy=(cfg.name == "image_only"))
