"""Train -> checkpoint -> predict_risk -> evaluate round trip."""

import numpy as np
import pytest

from multimodal_survival_prediction_tpu.analysis import evaluate_predictions
from multimodal_survival_prediction_tpu.config import RNASEQ_ONLY
from multimodal_survival_prediction_tpu.data.synthetic import (
    SyntheticCohortSpec,
    generate_synthetic_cohort,
)
from multimodal_survival_prediction_tpu.train.cv import run_cross_validation
from multimodal_survival_prediction_tpu.train.predict import (
    fold_checkpoints,
    predict_risk,
)


def test_train_then_predict(tmp_path):
    spec = SyntheticCohortSpec(n_patients=36, rna_dim=100, seed=5,
                               p_rnaseq=0.9)
    table, paths = generate_synthetic_cohort(tmp_path, spec)
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2)
    run_cross_validation(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"],
        results_dir=tmp_path / "results", models_dir=tmp_path / "models",
        num_epochs=3)

    pred = predict_risk(
        cfg, tmp_path / "models" / "rnaseq_only" / "fold_1_best.msgpack",
        table, rnaseq_csv=paths["rnaseq_csv"])
    assert {"patient_id", "risk_score", "survival_time",
            "event"} <= set(pred.columns)
    assert len(pred) > 0
    assert np.all(np.isfinite(pred.risk_score))
    # feeds straight into the evaluation layer
    summary = evaluate_predictions(pred, out_dir=tmp_path / "eval")
    assert 0.0 <= summary["c_index"] <= 1.0
    assert (tmp_path / "eval" / "evaluation_summary.json").exists()

    # ---- hu_window plumbing: scoring must honor the training-time window
    # (a windowed checkpoint scored on unwindowed volumes is silently skewed)
    # rnaseq_only has no image modality, so exercise it on image_only below
    # in test_predict_hu_window.

    # ---- fold ensemble: all fold checkpoints, z-scored + averaged ----
    ckpts = fold_checkpoints(tmp_path / "models", "rnaseq_only")
    assert len(ckpts) == 2
    ens = predict_risk(cfg, ckpts, table, rnaseq_csv=paths["rnaseq_csv"])
    assert len(ens) == len(pred)
    assert np.all(np.isfinite(ens.risk_score))
    # z-scored average: near-zero mean, differs from any single fold
    assert abs(float(ens.risk_score.mean())) < 1.0
    assert not np.allclose(ens.risk_score.values, pred.risk_score.values)


@pytest.mark.slow
def test_predict_mmsurv_restores_constants(tmp_path):
    """MMsurvNet's 'constants' count-sketch matrices (models/mmsurv.py) are
    not stored in fold checkpoints; predict_risk must reproduce them with a
    real init. Scoring with a zeros tree instead silently zeroes the whole
    CBP pathway — scores then differ from the trained model with no error."""
    import jax
    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.config import MMSURV
    from multimodal_survival_prediction_tpu.data.datasets import (
        build_cohort_arrays,
        load_rnaseq_matrix,
        select_cohort,
    )
    from multimodal_survival_prediction_tpu.io.checkpoint import (
        load_checkpoint,
    )
    from multimodal_survival_prediction_tpu.train.adapters import (
        make_model_and_adapters,
    )

    spec = SyntheticCohortSpec(n_patients=14, rna_dim=30, seed=9,
                               p_imaging=1.0, p_rnaseq=1.0,
                               image_shapes=((20, 24, 24),))
    table, paths = generate_synthetic_cohort(tmp_path, spec)
    cfg = MMSURV.with_overrides(n_folds=2, batch_size=4,
                                image_shape=(16, 16, 8))
    run_cross_validation(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"],
        results_dir=tmp_path / "results", models_dir=tmp_path / "models",
        backbone="simple_cnn", num_epochs=1)
    ckpt = tmp_path / "models" / "mmsurv" / "fold_1_best.msgpack"
    pred = predict_risk(cfg, ckpt, table, rnaseq_csv=paths["rnaseq_csv"],
                        labeled_only=False)

    # oracle: restored weights + REAL init non-param collections, applied
    # directly (cohort built identically, so row order matches)
    cohort = select_cohort(table, cfg.name)
    rnaseq_df = load_rnaseq_matrix(paths["rnaseq_csv"])
    arrays = build_cohort_arrays(cohort, rnaseq_df, with_image=True,
                                 image_shape=cfg.image_shape)
    model, batch_to_inputs, _ = make_model_and_adapters(
        cfg, rna_dim=arrays.arrays["rnaseq"].shape[1], backbone="simple_cnn")
    data = {k: jnp.asarray(v) for k, v in arrays.arrays.items()}
    data["valid"] = data["svalid"]
    real = model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(0)},
                      *batch_to_inputs(data), train=False)
    assert "constants" in real  # the collection this test is about
    restored = load_checkpoint(ckpt, {
        "params": real["params"], "batch_stats": real["batch_stats"]})
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"],
                 "constants": real["constants"]}
    oracle = np.asarray(
        model.apply(variables, *batch_to_inputs(data), train=False))
    assert pred.patient_id.tolist() == arrays.patient_ids
    np.testing.assert_allclose(pred.risk_score.values, oracle, atol=1e-5)

    # and zeroed constants must CHANGE the scores — proving the pathway is
    # live and the zeros-tree regression would have been visible here
    zeroed = {**variables, "constants": jax.tree_util.tree_map(
        jnp.zeros_like, real["constants"])}
    h0 = np.asarray(
        model.apply(zeroed, *batch_to_inputs(data), train=False))
    assert not np.allclose(h0, oracle, atol=1e-5)


def test_predict_hu_window(tmp_path):
    """predict_risk must apply the same HU window the checkpoint was trained
    with: windowed vs unwindowed scoring of an image model produces different
    risks for imaging patients (the silent-skew path a mismatched window
    would take)."""
    from multimodal_survival_prediction_tpu.config import IMAGE_ONLY

    spec = SyntheticCohortSpec(n_patients=12, rna_dim=20, seed=3,
                               p_imaging=1.0, image_shapes=((20, 24, 24),))
    table, paths = generate_synthetic_cohort(tmp_path, spec)
    cfg = IMAGE_ONLY.with_overrides(n_folds=2, batch_size=4,
                                    image_shape=(16, 16, 8))
    run_cross_validation(
        cfg, table, results_dir=tmp_path / "results",
        models_dir=tmp_path / "models", num_epochs=1,
        hu_window=(0.0, 150.0))
    ckpt = tmp_path / "models" / "image_only" / "fold_1_best.msgpack"

    # the checkpoint's .meta.json recorded hu_window at training time, so a
    # bare predict_risk scores with the MATCHED window automatically
    auto = predict_risk(cfg, ckpt, table)
    explicit = predict_risk(cfg, ckpt, table, hu_window=(0.0, 150.0))
    assert np.all(np.isfinite(auto.risk_score))
    np.testing.assert_allclose(auto.risk_score.values,
                               explicit.risk_score.values, atol=1e-6)
    # an explicitly mismatched window produces different risks (the silent
    # skew the metadata exists to prevent)
    mismatched = predict_risk(cfg, ckpt, table, hu_window=(0.0, 50.0))
    assert not np.allclose(auto.risk_score.values,
                           mismatched.risk_score.values)

    meta_path = ckpt.parent / "fold_1_best.msgpack.meta.json"
    assert meta_path.exists()
    import json

    meta = json.loads(meta_path.read_text())
    assert meta["hu_window"] == [0.0, 150.0]
    assert meta["image_shape"] == [16, 16, 8]


def test_fold_calibration_stats(tmp_path):
    """return_fold_stats gives per-fold (mu, sd) of the raw log-hazards over
    the cohort — the serving calibration contract: z-scoring each single-fold
    prediction with them and averaging reproduces the ensemble scores."""
    spec = SyntheticCohortSpec(n_patients=30, rna_dim=60, seed=8,
                               p_rnaseq=0.95)
    table, paths = generate_synthetic_cohort(tmp_path, spec)
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2)
    run_cross_validation(cfg, table, rnaseq_csv=paths["rnaseq_csv"],
                         results_dir=tmp_path / "r",
                         models_dir=tmp_path / "m", num_epochs=2)
    ckpts = fold_checkpoints(tmp_path / "m", "rnaseq_only")
    ens, stats = predict_risk(cfg, ckpts, table,
                              rnaseq_csv=paths["rnaseq_csv"],
                              return_fold_stats=True)
    assert len(stats) == 2
    singles = [predict_risk(cfg, c, table, rnaseq_csv=paths["rnaseq_csv"])
               for c in ckpts]
    for (mu, sd), s in zip(stats, singles):
        assert mu == pytest.approx(float(s.risk_score.mean()), abs=1e-5)
        # population std (ddof=0) — matches the ensemble z-score in
        # predict_risk (numpy default), not pandas' sample std
        assert sd == pytest.approx(float(s.risk_score.std(ddof=0)),
                                   abs=1e-5)
    rebuilt = np.mean([(s.risk_score.values - mu) / (sd + 1e-8)
                       for (mu, sd), s in zip(stats, singles)], axis=0)
    np.testing.assert_allclose(rebuilt, ens.risk_score.values, atol=1e-5)
