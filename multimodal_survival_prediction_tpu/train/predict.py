"""Inference: load a fold checkpoint, score a cohort, emit predictions.

The reference documents this flow (reference README.md:386-399: rebuild the
model, load_state_dict, forward in eval mode) but ships no working code for
it (its generate_km_curves.py is a stub). This is the library version, used
by scripts/analysis/generate_km_curves.py and usable standalone:

    pred = predict_risk(cfg, "models/partial_modality/fold_1_best.msgpack",
                        table, rnaseq_csv)
    pred.to_csv("results/test_predictions.csv", index=False)
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
import pandas as pd

from ..config import ModelRunConfig
from ..data.datasets import (
    build_cohort_arrays,
    load_rnaseq_matrix,
    select_cohort,
)
from ..io.checkpoint import load_checkpoint
from .adapters import make_model_and_adapters


def predict_risk(
    cfg: ModelRunConfig,
    checkpoint_path,
    table: pd.DataFrame,
    rnaseq_csv=None,
    backbone: str | None = None,
    labeled_only: bool = True,
    batch_size: int = 64,
    use_pallas: bool | None = None,
    hu_window=None,
    return_fold_stats: bool = False,
) -> pd.DataFrame:
    """Score a cohort with a trained fold checkpoint — or a FOLD ENSEMBLE
    when ``checkpoint_path`` is a sequence of paths (per-fold z-scored
    log-hazards averaged; one compiled scorer serves all folds).

    ``backbone``/``hu_window``/image shape default from the checkpoint's
    ``.meta.json`` (written at training time) so scoring matches training
    ingest without the caller re-stating it; explicit arguments win.

    Returns columns (patient_id, risk_score, survival_time, event) — the
    test-predictions contract consumed by scripts/analysis/evaluate_model.py
    (reference evaluate_model.py expects exactly these)."""
    from ..io.checkpoint import load_fold_meta

    paths = ([checkpoint_path]
             if isinstance(checkpoint_path, (str, Path))
             else list(checkpoint_path))
    meta = load_fold_meta(paths[0]) or {}
    backbone = backbone or meta.get("backbone") or "densenet121"
    if hu_window is None and meta.get("hu_window"):
        hu_window = tuple(meta["hu_window"])
    if use_pallas is None:
        use_pallas = bool(meta.get("use_pallas_resample", False))
    # Pin scoring-time resample PLACEMENT (host C++ vs device XLA/Pallas) to
    # the training-time path when the checkpoint recorded it: the two agree
    # only to ~2e-5, and 'auto' re-probes the link per process, so without
    # the pin risk scores could vary with link weather.
    resample_mode = meta.get("resample_mode")
    if meta.get("image_shape") and tuple(meta["image_shape"]) != tuple(
            cfg.image_shape):
        import dataclasses

        cfg = dataclasses.replace(cfg,
                                  image_shape=tuple(meta["image_shape"]))

    cohort = select_cohort(table, cfg.name)
    rnaseq_df = None
    if "rnaseq" in cfg.modalities and rnaseq_csv is not None and Path(
            rnaseq_csv).exists():
        rnaseq_df = load_rnaseq_matrix(rnaseq_csv)
        if cfg.name == "rnaseq_only":
            cohort = cohort[cohort.patient_id.isin(set(rnaseq_df.index))]

    # hu_window/use_pallas must match what training ingest used (a model
    # trained with --hu-window scored on unwindowed volumes sees a shifted
    # CT distribution and produces silently skewed risks)
    arrays = build_cohort_arrays(
        cohort, rnaseq_df, with_image="image" in cfg.modalities,
        image_shape=cfg.image_shape, use_pallas=use_pallas,
        hu_window=hu_window, resample=resample_mode)

    model, batch_to_inputs, hazard_and_aux = make_model_and_adapters(
        cfg, backbone=backbone)
    hazard_and_aux = hazard_and_aux or (lambda out, b: (out, 0.0))

    data = {k: np.asarray(v) for k, v in arrays.arrays.items()}
    n = arrays.n

    # abstract init for checkpoint structure, then restore real weights
    ex = {k: jax.numpy.asarray(v[:1]) for k, v in data.items()}
    ex["valid"] = ex["svalid"]
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0)},
            *batch_to_inputs(ex), train=False))
    target = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)
    extra_keys = [k for k in shapes if k not in ("params", "batch_stats")]
    extras = {}
    if extra_keys:
        # Non-param collections (e.g. MMsurvNet's 'constants' count-sketch
        # matrices, models/mmsurv.py:48-57) are NOT stored in fold
        # checkpoints, and an eval_shape zeros tree would silently zero the
        # pathway they feed (zero sketch matrices -> CBP output identically
        # 0). They are deterministic fixed-seed values, so one real init
        # reproduces exactly what training used.
        real = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0)},
            *batch_to_inputs(ex), train=False))()
        extras = {k: jax.tree_util.tree_map(np.asarray, real[k])
                  for k in extra_keys}

    # variables as an ARGUMENT: one compiled scorer serves every fold
    # checkpoint of an ensemble (identical param shapes).
    @jax.jit
    def score(variables, batch):
        out = model.apply(variables, *batch_to_inputs(batch), train=False)
        hazard = hazard_and_aux(out, batch)[0]  # 2- or 3-tuple adapters
        return hazard

    per_ckpt = np.empty((len(paths), n), np.float32)
    for ci, cp in enumerate(paths):
        restored = load_checkpoint(cp, {
            "params": target["params"],
            "batch_stats": target.get("batch_stats", {})})
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"], **extras}
        for start in range(0, n, batch_size):
            end = min(start + batch_size, n)
            idx = np.arange(start, end)
            # pad to batch_size for a single compiled shape
            pad = np.concatenate(
                [idx, np.full(batch_size - len(idx), idx[-1])])
            batch = {k: jax.numpy.asarray(v[pad]) for k, v in data.items()}
            batch["valid"] = batch["svalid"]
            per_ckpt[ci, start:end] = np.asarray(
                score(variables, batch))[: len(idx)]

    if len(paths) == 1:
        hazards = per_ckpt[0]
    else:
        # Fold ensemble: Cox log-hazards are only defined up to a per-model
        # shift (and effectively a scale once trained on different folds), so
        # z-score each fold's scores over the cohort before averaging —
        # a rank-stable combination. Capability beyond the reference (it
        # scores with a single fold's weights, README.md:386-399).
        mu = per_ckpt.mean(axis=1, keepdims=True)
        sd = per_ckpt.std(axis=1, keepdims=True) + 1e-8
        hazards = ((per_ckpt - mu) / sd).mean(axis=0)

    pred = pd.DataFrame({
        "patient_id": arrays.patient_ids,
        "risk_score": hazards,
        "survival_time": data["time"],
        "event": data["event"],
    })
    if labeled_only:
        pred = pred[data["svalid"] > 0].reset_index(drop=True)
    if return_fold_stats:
        # per-fold (mu, sd) over the WHOLE cohort — the calibration pairs
        # serving.RiskScorer(fold_calibration=...) consumes so its per-fold
        # z-score matches this function's ensemble combination
        stats = [(float(per_ckpt[ci].mean()), float(per_ckpt[ci].std()))
                 for ci in range(len(paths))]
        return pred, stats
    return pred


def fold_checkpoints(models_dir, name: str):
    """All models/<name>/fold_K_best.msgpack paths, fold-ordered."""
    import re

    d = Path(models_dir) / name
    paths = sorted(d.glob("fold_*_best.msgpack"),
                   key=lambda p: int(re.findall(r"\d+", p.name)[0]))
    if not paths:
        raise FileNotFoundError(f"no fold checkpoints under {d}")
    return paths
