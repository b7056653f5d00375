"""cv_results.json writers/readers, structurally matching the reference.

Two schema variants exist (SURVEY §2.8):
  * standard — top-level model/c_index_mean/c_index_std/fold_results/
    hyperparameters (+ per-script extra keys like n_folds/num_epochs/
    dataset_size) — writers at reference train_rnaseq_only.py:324-336,
    partial_modality_training.py:592-607 etc.
  * legacy (image_only) — no "model" key, just c_index_mean/std +
    bare fold_results.
Readers must tolerate both (reference final_comparison.py:46-60).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def build_cv_payload(
    model_display_name: str | None,
    fold_results: list[dict],
    hyperparameters: dict | None = None,
    extra: dict | None = None,
    legacy: bool = False,
) -> dict:
    """Assemble the cv_results payload WITHOUT touching the filesystem
    (used directly by write_outputs=False and multihost non-coordinator
    runs, which must return the same payload they would have written)."""
    cs = np.array([f["best_c_index"] for f in fold_results], np.float64)
    payload: dict = {}
    if not legacy and model_display_name is not None:
        payload["model"] = model_display_name
    if extra:
        payload.update(extra)
    payload["c_index_mean"] = float(cs.mean())
    payload["c_index_std"] = float(cs.std())  # population std, like np in ref
    payload["fold_results"] = fold_results
    if hyperparameters and not legacy:
        payload["hyperparameters"] = hyperparameters
    return payload


def write_cv_results(
    out_dir,
    model_display_name: str | None,
    fold_results: list[dict],
    hyperparameters: dict | None = None,
    extra: dict | None = None,
    legacy: bool = False,
) -> dict:
    """fold_results: list of {"fold": k, "best_c_index": ..., ...}."""
    payload = build_cv_payload(model_display_name, fold_results,
                               hyperparameters=hyperparameters, extra=extra,
                               legacy=legacy)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "cv_results.json", "w") as f:
        json.dump(payload, f, indent=2)
    return payload


def load_cv_results(path) -> dict:
    """Schema-tolerant reader (both variants)."""
    path = Path(path)
    if path.is_dir():
        path = path / "cv_results.json"
    with open(path) as f:
        raw = json.load(f)
    folds = raw.get("fold_results", [])
    scores = [f.get("best_c_index", f.get("c_index")) for f in folds]
    scores = [s for s in scores if s is not None]
    return {
        "model": raw.get("model", path.parent.name),
        "c_index_mean": raw.get(
            "c_index_mean", float(np.mean(scores)) if scores else float("nan")
        ),
        "c_index_std": raw.get(
            "c_index_std", float(np.std(scores)) if scores else float("nan")
        ),
        "fold_scores": scores,
        "hyperparameters": raw.get("hyperparameters", {}),
        "raw": raw,
    }
