#!/usr/bin/env python
"""Comprehensive multi-model analysis (parity with reference
scripts/training/comprehensive_analysis.py): ranked bars, fold-wise grouped
bars, pairwise significance heatmap, per-model coefficient-of-variation and
95% CIs, and results/comprehensive_analysis/summary_statistics.csv."""

from common import base_parser


def main():
    args = base_parser(__doc__).parse_args()
    from pathlib import Path

    from multimodal_survival_prediction_tpu.analysis import (
        collect_results,
        pairwise_significance,
    )
    from multimodal_survival_prediction_tpu.analysis.comparison import (
        summary_statistics_csv,
    )
    from multimodal_survival_prediction_tpu.analysis.figures import (
        foldwise_bars,
        model_comparison_main,
        performance_vs_dataset_size,
        significance_heatmap,
        violin_scatter,
    )

    out = Path(args.out_dir
               or Path(args.results_root) / "comprehensive_analysis")
    df = collect_results(args.results_root)
    if not len(df):
        print(f"no cv_results.json found under {args.results_root}")
        return

    model_comparison_main(df, out / "ranked_comparison.png")
    foldwise_bars(df, out / "foldwise_scores.png")
    violin_scatter(df, out / "violin_scatter.png")
    performance_vs_dataset_size(df, out / "performance_vs_size.png")
    if len(df) > 1:
        pmat = pairwise_significance(df)
        significance_heatmap(pmat, out / "significance_heatmap.png")
    stats = summary_statistics_csv(df, out / "summary_statistics.csv")
    print(stats.to_string(index=False))
    print(f"\nartifacts -> {out}")


if __name__ == "__main__":
    main()
