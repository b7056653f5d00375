"""Analysis layer: model comparison, statistics, figures, reports, KM
evaluation — the capabilities of reference scripts/analysis/* and the two
analysis scripts in scripts/training/ (SURVEY §2.7)."""

from .comparison import (  # noqa: F401
    collect_results,
    pairwise_significance,
    paired_t_vs_best,
    generate_summary_md,
    export_results_json,
)
from .evaluate import evaluate_predictions  # noqa: F401
