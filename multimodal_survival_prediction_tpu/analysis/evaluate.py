"""Test-set evaluation from a predictions table.

Functional equivalent of reference scripts/analysis/evaluate_model.py:
reads/receives (patient_id, risk_score, survival_time, event), computes the
C-index (:41-47 — note lifelines is called with NEGATED risk there; our
concordance_index takes risk directly with the same result), median-splits
into High/Low risk groups (:57-65), fits KM per group with a log-rank test
(:74-118), and emits evaluation_summary.json (:197-225).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd

from ..ops.cindex import concordance_index_np
from ..ops.km import kaplan_meier, logrank_test


def evaluate_predictions(pred: pd.DataFrame, out_dir=None) -> dict:
    """pred columns: patient_id, risk_score, survival_time, event."""
    risk = pred.risk_score.to_numpy(np.float64)
    time = pred.survival_time.to_numpy(np.float64)
    event = pred.event.to_numpy(np.float64)

    cindex = concordance_index_np(risk, time, event)

    median_risk = float(np.median(risk))
    # strict >: reference evaluate_model.py:58-60 assigns 'High Risk' only
    # when risk_score > median
    high = risk > median_risk
    low = ~high

    km_high = kaplan_meier(time[high], event[high])
    km_low = kaplan_meier(time[low], event[low])
    lr = logrank_test(time[high], event[high], time[low], event[low])

    summary = {
        "n_patients": int(len(pred)),
        "n_events": int(event.sum()),
        "c_index": cindex,
        "median_risk_score": median_risk,
        "risk_groups": {
            "high": {
                "n": int(high.sum()),
                "events": int(event[high].sum()),
                "median_survival": km_high.median_survival_time,
            },
            "low": {
                "n": int(low.sum()),
                "events": int(event[low].sum()),
                "median_survival": km_low.median_survival_time,
            },
        },
        "logrank": {"statistic": lr.test_statistic, "p_value": lr.p_value},
        "risk_score_stats": {
            "mean": float(risk.mean()), "std": float(risk.std()),
            "min": float(risk.min()), "max": float(risk.max()),
        },
    }
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        (out_dir / "evaluation_summary.json").write_text(
            json.dumps(_sanitize(summary), indent=2))
    return summary


def _sanitize(o):
    """inf/nan -> None so the JSON stays standards-compliant (median survival
    is inf when the KM curve never crosses 0.5)."""
    if isinstance(o, dict):
        return {k: _sanitize(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_sanitize(v) for v in o]
    if isinstance(o, float) and not np.isfinite(o):
        return None
    return o


def km_groups(pred: pd.DataFrame):
    """(km_high, km_low, logrank) for figure generation."""
    risk = pred.risk_score.to_numpy(np.float64)
    time = pred.survival_time.to_numpy(np.float64)
    event = pred.event.to_numpy(np.float64)
    med = np.median(risk)
    hi = risk > med  # strict, reference evaluate_model.py:58-60
    return (kaplan_meier(time[hi], event[hi]),
            kaplan_meier(time[~hi], event[~hi]),
            logrank_test(time[hi], event[hi], time[~hi], event[~hi]))


def km_event_types(pred: pd.DataFrame) -> dict:
    """{label: KaplanMeier} per event type (reference
    evaluate_model.py:99-112 fits KM separately on the censored subset and
    the death subset — the censored-only curve stays at 1.0 by
    construction; reproduced as-is). Subsets with no patients are omitted."""
    time = pred.survival_time.to_numpy(np.float64)
    event = pred.event.to_numpy(np.float64)
    curves = {}
    for label, val in (("Censored", 0), ("Death", 1)):
        mask = event == val
        if mask.sum() > 0:
            curves[label] = kaplan_meier(time[mask], event[mask])
    return curves
