"""Analysis-layer tests: comparison stats, summary generation, evaluation."""

import json

import numpy as np
import pandas as pd
import pytest

from multimodal_survival_prediction_tpu.analysis import (
    collect_results,
    evaluate_predictions,
    export_results_json,
    generate_summary_md,
    paired_t_vs_best,
    pairwise_significance,
)
from multimodal_survival_prediction_tpu.analysis.comparison import (
    recommendation_tier,
    summary_statistics_csv,
)
from multimodal_survival_prediction_tpu.io.results import write_cv_results


@pytest.fixture
def results_root(tmp_path):
    write_cv_results(
        tmp_path / "rnaseq_only", "RNASeq-Only",
        [{"fold": k, "best_c_index": c, "best_epoch": 5}
         for k, c in enumerate([0.58, 0.66, 0.61], 1)],
        hyperparameters={"batch_size": 16})
    write_cv_results(
        tmp_path / "image_only", None,
        [{"fold": k, "best_c_index": c}
         for k, c in enumerate([0.65, 0.54, 0.58], 1)],
        legacy=True)
    return tmp_path


def test_collect_and_rank(results_root):
    df = collect_results(results_root)
    assert len(df) == 2
    assert df.iloc[0].model == "RNASeq-Only"  # higher mean first
    assert df.iloc[1].model == "image_only"  # legacy name from dir


def test_paired_t_and_matrix(results_root):
    df = collect_results(results_root)
    dfp = paired_t_vs_best(df)
    assert np.isnan(dfp.iloc[0].p_value)
    assert 0 <= dfp.iloc[1].p_value <= 1
    pmat = pairwise_significance(df)
    assert pmat.shape == (2, 2)
    assert np.isnan(pmat.iloc[0, 0])
    assert pmat.iloc[0, 1] == pytest.approx(pmat.iloc[1, 0])


def test_summary_and_export(results_root, tmp_path):
    df = collect_results(results_root)
    md = generate_summary_md(df, None, tmp_path / "SUMMARY.md")
    assert "RNASeq-Only" in md and "| Rank |" in md
    payload = export_results_json(df, None, tmp_path / "results.json")
    on_disk = json.loads((tmp_path / "results.json").read_text())
    assert on_disk["best_model"] == "RNASeq-Only"
    assert len(on_disk["models"]) == 2
    stats = summary_statistics_csv(df, tmp_path / "summary_statistics.csv")
    assert {"model", "mean_c_index", "cv_percent",
            "ci95_low"} <= set(stats.columns)


def test_recommendation_tiers():
    assert "Excellent" in recommendation_tier(0.72)
    assert "random" in recommendation_tier(0.51)


def test_evaluate_predictions(tmp_path, rng):
    n = 80
    risk = rng.normal(size=n)
    time = np.exp(-risk) * rng.exponential(100, size=n) + 1
    event = (rng.uniform(size=n) < 0.7).astype(float)
    pred = pd.DataFrame(dict(
        patient_id=[f"P{i}" for i in range(n)], risk_score=risk,
        survival_time=time, event=event))
    summary = evaluate_predictions(pred, out_dir=tmp_path)
    assert summary["c_index"] > 0.6  # planted signal
    assert summary["risk_groups"]["high"]["n"] + \
        summary["risk_groups"]["low"]["n"] == n
    on_disk = json.loads((tmp_path / "evaluation_summary.json").read_text())
    assert on_disk["n_patients"] == n
    assert on_disk["logrank"]["p_value"] <= 1.0


def test_figures_render(results_root, tmp_path):
    """All figure generators produce files (Agg backend, no display)."""
    import numpy as np
    import pandas as pd

    from multimodal_survival_prediction_tpu.analysis.figures import (
        ablation_study,
        foldwise_bars,
        km_plot,
        model_comparison_main,
        modality_availability,
        performance_vs_dataset_size,
        risk_distributions,
        significance_heatmap,
        violin_scatter,
    )
    from multimodal_survival_prediction_tpu.ops.km import kaplan_meier

    df = collect_results(results_root)
    assert model_comparison_main(df, tmp_path / "a.png").exists()
    assert ablation_study(df, tmp_path / "b.png").exists()
    assert foldwise_bars(df, tmp_path / "c.png").exists()
    assert significance_heatmap(
        pairwise_significance(df), tmp_path / "d.png").exists()
    assert violin_scatter(df, tmp_path / "h.png").exists()
    assert performance_vs_dataset_size(df, tmp_path / "i.png").exists()

    rng = np.random.default_rng(0)
    t = rng.uniform(1, 100, 50)
    e = (rng.uniform(size=50) < 0.7).astype(float)
    km = kaplan_meier(t, e)
    assert km_plot({"all": km}, tmp_path / "e.png", pvalue=0.03).exists()

    table = pd.DataFrame(dict(
        patient_id=[f"P{i}" for i in range(20)],
        has_imaging=rng.uniform(size=20) < 0.5,
        has_rnaseq=rng.uniform(size=20) < 0.5,
        has_clinical=True, has_survival=rng.uniform(size=20) < 0.5,
        survival_status=(rng.uniform(size=20) < 0.5).astype(int)))
    assert modality_availability(table, tmp_path / "f.png").exists()

    pred = pd.DataFrame(dict(risk_score=rng.normal(size=30),
                             survival_time=rng.uniform(1, 50, 30),
                             event=(rng.uniform(size=30) < 0.6).astype(float)))
    assert risk_distributions(pred, tmp_path / "g.png").exists()


def test_model_comparison_analysis_figure(results_root, tmp_path):
    """6-panel figure (reference analyze_all_results.py:157-330) renders,
    including the improvement-over-Image-Only panel and summary table."""
    from multimodal_survival_prediction_tpu.analysis.figures import (
        model_comparison_analysis,
    )

    df = collect_results(results_root)
    out = model_comparison_analysis(df, tmp_path / "mca.png")
    assert out.exists() and out.stat().st_size > 10_000


def test_km_event_types_and_panels(tmp_path, rng):
    """Per-event-type KM split (reference evaluate_model.py:99-112) and the
    2-panel kaplan_meier_curves figure."""
    from multimodal_survival_prediction_tpu.analysis.evaluate import (
        km_event_types,
        km_groups,
    )
    from multimodal_survival_prediction_tpu.analysis.figures import (
        kaplan_meier_panels,
    )

    n = 60
    risk = rng.normal(size=n)
    pred = pd.DataFrame(dict(
        risk_score=risk,
        survival_time=np.exp(-risk) * rng.exponential(80, size=n) + 1,
        event=(rng.uniform(size=n) < 0.6).astype(float)))
    curves = km_event_types(pred)
    assert set(curves) == {"Censored", "Death"}
    # censored-only KM has zero events: survival stays at 1 (reference
    # behavior, reproduced as-is)
    assert float(np.min(curves["Censored"].survival)) == 1.0
    assert float(np.min(curves["Death"].survival)) < 1.0

    hi, lo, lr = km_groups(pred)
    out = kaplan_meier_panels({"Low Risk": lo, "High Risk": hi}, curves,
                              tmp_path / "km2.png", pvalue=lr.p_value)
    assert out.exists()

    # all-events edge: censored subset absent -> omitted
    pred_all = pred.assign(event=1.0)
    assert set(km_event_types(pred_all)) == {"Death"}
