#!/usr/bin/env python
"""Test-set evaluation from a predictions CSV (parity with reference
scripts/analysis/evaluate_model.py): expects columns patient_id, risk_score,
survival_time, event; computes C-index, median-split risk groups, per-group
KM curves + log-rank, risk distributions, and evaluation_summary.json."""

from common import base_parser


def main():
    p = base_parser(__doc__)
    p.add_argument("--predictions", default="results/test_predictions.csv")
    args = p.parse_args()

    from pathlib import Path

    import pandas as pd

    from multimodal_survival_prediction_tpu.analysis import (
        evaluate_predictions,
    )
    from multimodal_survival_prediction_tpu.analysis.evaluate import (
        km_event_types,
        km_groups,
    )
    from multimodal_survival_prediction_tpu.analysis.figures import (
        kaplan_meier_panels,
        km_plot,
        risk_distributions,
    )

    pred_path = Path(args.predictions)
    if not pred_path.exists():
        print(f"predictions file not found: {pred_path}")
        return
    pred = pd.read_csv(pred_path)
    out = Path(args.out_dir or Path(args.results_root) / "evaluation")

    summary = evaluate_predictions(pred, out_dir=out)
    hi, lo, lr = km_groups(pred)
    km_plot({"high risk": hi, "low risk": lo}, out / "km_risk_groups.png",
            title="KM by risk group", pvalue=lr.p_value)
    # 2-panel figure: risk groups + per-event-type curves (reference
    # evaluate_model.py:74-118 -> kaplan_meier_curves.png)
    kaplan_meier_panels(
        {"Low Risk": lo, "High Risk": hi}, km_event_types(pred),
        out / "kaplan_meier_curves.png", pvalue=lr.p_value)
    risk_distributions(pred, out / "risk_distributions.png")

    print(f"C-index: {summary['c_index']:.4f}")
    print(f"log-rank p: {summary['logrank']['p_value']:.4g}")
    print(f"artifacts -> {out}")


if __name__ == "__main__":
    main()
