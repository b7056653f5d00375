#!/usr/bin/env python
"""Cross-model results analysis with report (parity with reference
scripts/analysis/analyze_all_results.py): stats summary, fold pivot, full
p-value matrix, improvement over the Image-Only baseline, the 6-panel
model_comparison_analysis.png figure (reference :157-330), and
results/analysis_report.txt with recommendation tiers."""

from common import base_parser


def main():
    args = base_parser(__doc__).parse_args()
    from pathlib import Path

    import pandas as pd

    from multimodal_survival_prediction_tpu.analysis import (
        collect_results,
        pairwise_significance,
    )
    from multimodal_survival_prediction_tpu.analysis.comparison import (
        recommendation_tier,
    )

    root = Path(args.results_root)
    df = collect_results(root)
    if not len(df):
        print(f"no cv_results.json found under {root}")
        return

    lines = ["=" * 60, "ANALYSIS REPORT", "=" * 60, ""]
    lines.append(f"{'model':<32}{'mean':>8}{'std':>8}{'folds':>7}")
    for _, r in df.iterrows():
        lines.append(f"{r.model:<32}{r.c_index_mean:>8.4f}"
                     f"{r.c_index_std:>8.4f}{r.n_folds:>7}")

    # fold pivot
    lines += ["", "Fold-wise C-index:"]
    pivot = pd.DataFrame(
        {r.model: pd.Series(r.fold_scores) for _, r in df.iterrows()})
    lines.append(pivot.to_string())

    # p-value matrix
    if len(df) > 1:
        lines += ["", "Pairwise p-values:"]
        lines.append(pairwise_significance(df).round(4).to_string())

    # improvement over image-only baseline
    base_rows = df[df.key.str.contains("image_only", case=False)]
    if len(base_rows):
        b = float(base_rows.iloc[0].c_index_mean)
        lines += ["", f"Improvement over Image-Only ({b:.4f}):"]
        for _, r in df.iterrows():
            if r.key == base_rows.iloc[0].key:
                continue
            lines.append(f"  {r.model}: {100 * (r.c_index_mean - b) / b:+.1f}%")

    lines += ["", "Recommendations:"]
    for _, r in df.iterrows():
        lines.append(f"  {r.model}: {recommendation_tier(r.c_index_mean)}")

    report = "\n".join(lines) + "\n"
    out = Path(args.out_dir or root) / "analysis_report.txt"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(report)
    print(report)
    print(f"report -> {out}")

    # 6-panel comparison figure (reference analyze_all_results.py:157-330
    # saves results/model_comparison_analysis.png)
    from multimodal_survival_prediction_tpu.analysis.figures import (
        model_comparison_analysis,
    )

    fig_path = model_comparison_analysis(
        df, out.parent / "model_comparison_analysis.png")
    print(f"figure -> {fig_path}")


if __name__ == "__main__":
    main()
