"""Model comparison statistics + SUMMARY.md / results.json generation.

Functional equivalent of reference scripts/training/final_comparison.py:
schema-tolerant loading (:46-60), paired t-tests vs the best model (:69-85),
dataset stats from the matching table (:93-111), SUMMARY.md (:261-347) and
results.json export (:353-374) — as library functions over explicit inputs
instead of hardcoded paths/patient-counts.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path

import numpy as np
import pandas as pd
from scipy import stats as sstats

from ..data.matching_table import cohort_stats
from ..io.results import load_cv_results


def collect_results(results_root, model_dirs=None) -> pd.DataFrame:
    """Load every <results_root>/<model>/cv_results.json (both schema
    variants) into a tidy frame sorted by mean C-index desc."""
    results_root = Path(results_root)
    if model_dirs is None:
        model_dirs = sorted(
            p.parent.name for p in results_root.glob("*/cv_results.json"))
    rows = []
    for d in model_dirs:
        path = results_root / d / "cv_results.json"
        if not path.exists():
            continue
        r = load_cv_results(path)
        rows.append(dict(
            key=d, model=r["model"], c_index_mean=r["c_index_mean"],
            c_index_std=r["c_index_std"], fold_scores=r["fold_scores"],
            n_folds=len(r["fold_scores"]),
            hyperparameters=r["hyperparameters"],
            raw=r["raw"],
        ))
    df = pd.DataFrame(rows)
    if len(df):
        df = df.sort_values("c_index_mean", ascending=False).reset_index(
            drop=True)
    return df


def paired_t_vs_best(df: pd.DataFrame) -> pd.DataFrame:
    """Paired t-test of each model's fold scores against the best model's
    (requires equal fold counts; otherwise Welch on unpaired scores, noted)."""
    if not len(df):
        return df
    best = df.iloc[0]
    out = []
    for _, row in df.iterrows():
        if row.key == best.key:
            out.append(dict(key=row.key, p_value=np.nan, test="-"))
            continue
        a, b = np.asarray(best.fold_scores), np.asarray(row.fold_scores)
        if len(a) == len(b) and len(a) > 1:
            t, p = sstats.ttest_rel(a, b)
            test = "paired-t"
        elif len(a) > 1 and len(b) > 1:
            t, p = sstats.ttest_ind(a, b, equal_var=False)
            test = "welch-t"
        else:
            p, test = np.nan, "n/a"
        out.append(dict(key=row.key, p_value=float(p), test=test))
    return df.merge(pd.DataFrame(out), on="key")


def pairwise_significance(df: pd.DataFrame) -> pd.DataFrame:
    """Full p-value matrix between all model pairs (reference
    analyze_all_results.py:108-152, comprehensive_analysis significance
    heatmap)."""
    n = len(df)
    mat = np.full((n, n), np.nan)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            a = np.asarray(df.iloc[i].fold_scores)
            b = np.asarray(df.iloc[j].fold_scores)
            if len(a) == len(b) and len(a) > 1:
                _, p = sstats.ttest_rel(a, b)
            elif len(a) > 1 and len(b) > 1:
                _, p = sstats.ttest_ind(a, b, equal_var=False)
            else:
                continue
            mat[i, j] = p
    return pd.DataFrame(mat, index=df.model, columns=df.model)


def recommendation_tier(c: float) -> str:
    """C-index tiers (reference analyze_all_results.py:384-393)."""
    if c >= 0.70:
        return "Excellent - clinically promising"
    if c >= 0.65:
        return "Good - strong predictive signal"
    if c >= 0.60:
        return "Moderate - useful signal"
    if c >= 0.55:
        return "Weak - marginal improvement over random"
    return "Needs improvement - near random"


def generate_summary_md(df: pd.DataFrame, table: pd.DataFrame | None,
                        out_path=None) -> str:
    """Markdown summary structurally matching results/final_comparison/
    SUMMARY.md: dataset stats, ranked performance table, findings."""
    lines = ["# Model Comparison Summary", "",
             f"Generated: {datetime.now():%Y-%m-%d %H:%M}", ""]
    if table is not None:
        s = cohort_stats(table)
        lines += [
            "## Dataset", "",
            f"- Total patients: {s['total_patients']}",
            f"- With CT imaging: {s['with_imaging']}",
            f"- With RNA-seq: {s['with_rnaseq']}",
            f"- With clinical: {s['with_clinical']}",
            f"- With survival labels: {s['with_survival']}",
            f"- Complete (all modalities): {s['complete_multimodal']}", "",
        ]
    lines += ["## Performance (C-index, K-fold CV)", "",
              "| Rank | Model | C-index | Folds | p vs best |",
              "|---|---|---|---|---|"]
    dfp = paired_t_vs_best(df)
    for rank, (_, r) in enumerate(dfp.iterrows(), 1):
        p = "-" if np.isnan(r.get("p_value", np.nan)) else f"{r.p_value:.3f}"
        lines.append(
            f"| {rank} | {r.model} | {r.c_index_mean:.4f} ± "
            f"{r.c_index_std:.4f} | {r.n_folds} | {p} |")
    if len(df):
        best = df.iloc[0]
        lines += ["", "## Findings", "",
                  f"- Best model: **{best.model}** "
                  f"(C-index {best.c_index_mean:.4f})",
                  f"- Assessment: {recommendation_tier(best.c_index_mean)}"]
    text = "\n".join(lines) + "\n"
    if out_path:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        Path(out_path).write_text(text)
    return text


def export_results_json(df: pd.DataFrame, table: pd.DataFrame | None,
                        out_path=None) -> dict:
    """results.json export with the dataset_info block (the canonical cohort
    stats consumed downstream, SURVEY §2.13)."""
    payload = {
        "generated": datetime.now().isoformat(timespec="seconds"),
        "models": [
            dict(model=r.model, c_index_mean=float(r.c_index_mean),
                 c_index_std=float(r.c_index_std),
                 fold_scores=list(map(float, r.fold_scores)),
                 n_folds=int(r.n_folds))
            for _, r in df.iterrows()
        ],
    }
    if table is not None:
        payload["dataset_info"] = cohort_stats(table)
    if len(df):
        payload["best_model"] = df.iloc[0].model
    if out_path:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        Path(out_path).write_text(json.dumps(payload, indent=2))
    return payload


def summary_statistics_csv(df: pd.DataFrame, out_path=None) -> pd.DataFrame:
    """summary_statistics.csv (reference comprehensive_analysis.py:417-432):
    per-model mean/std/min/max/CV%/95% CI + the efficiency score
    mean/log10(dataset_size) when the results carry a dataset size."""
    rows = []
    for _, r in df.iterrows():
        fs = np.asarray(r.fold_scores, np.float64)
        mean, std = fs.mean(), fs.std()
        se = std / max(np.sqrt(len(fs)), 1)
        ci = 1.96 * se
        n_patients = None
        raw = getattr(r, "raw", None) or {}
        if isinstance(raw, dict):
            n_patients = raw.get("dataset_size")
        eff = (mean / np.log10(n_patients)
               if n_patients and n_patients > 10 else np.nan)
        rows.append(dict(
            model=r.model, mean_c_index=mean, std_c_index=std,
            min_c_index=fs.min(), max_c_index=fs.max(),
            cv_percent=100 * std / mean if mean else np.nan,
            ci95_low=mean - ci, ci95_high=mean + ci, n_folds=len(fs),
            dataset_size=n_patients, efficiency_score=eff))
    out = pd.DataFrame(rows)
    if out_path:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        out.to_csv(out_path, index=False)
    return out
