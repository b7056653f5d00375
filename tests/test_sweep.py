"""Vmapped hyperparameter sweep (train/sweep.py): the anchor candidate must
reproduce the sequential CV driver's fold-1 trajectory; LR/seed axes must
actually vary; the mesh path must shard candidates."""

import json

import numpy as np
import pytest

from multimodal_survival_prediction_tpu.config import RNASEQ_ONLY
from multimodal_survival_prediction_tpu.data.synthetic import (
    SyntheticCohortSpec,
    generate_synthetic_cohort,
)
from multimodal_survival_prediction_tpu.train.cv import run_cross_validation
from multimodal_survival_prediction_tpu.train.cv_parallel import (
    make_fold_mesh,
)
from multimodal_survival_prediction_tpu.train.sweep import (
    run_hyperparameter_sweep,
)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    td = tmp_path_factory.mktemp("cohort_sweep")
    spec = SyntheticCohortSpec(n_patients=36, rna_dim=100, seed=9,
                               p_imaging=0.0, p_rnaseq=1.0)
    table, paths = generate_synthetic_cohort(td, spec)
    return table, paths


def test_anchor_candidate_matches_sequential_fold1(cohort, tmp_path):
    table, paths = cohort
    cfg = RNASEQ_ONLY.with_overrides(n_folds=3, batch_size=8)
    _, o_seq = run_cross_validation(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"], num_epochs=3,
        results_dir=tmp_path / "r", models_dir=tmp_path / "m")
    board = run_hyperparameter_sweep(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"], num_epochs=3,
        seeds=(42, 7), learning_rates=(1e-4, 1e-3))
    assert len(board) == 4
    anchor = next(r for r in board
                  if r["seed"] == 42 and r["learning_rate"] == 1e-4)
    seq_hist = o_seq[0].history  # fold 1
    assert len(anchor["history"]) == len(seq_hist)
    for ha, hb in zip(anchor["history"], seq_hist):
        assert abs(ha["val_c_index"] - hb["val_c_index"]) < 1e-4
        assert abs(ha["train_loss"] - hb["train_loss"]) < 1e-4
    assert anchor["best_epoch"] == o_seq[0].best_epoch
    # the axes really vary: different lr must give a different trajectory
    other = next(r for r in board
                 if r["seed"] == 42 and r["learning_rate"] == 1e-3)
    assert (other["history"][-1]["train_loss"]
            != anchor["history"][-1]["train_loss"])
    # leaderboard sorted desc
    cs = [r["best_c_index"] for r in board]
    assert cs == sorted(cs, reverse=True)


@pytest.mark.slow
def test_simmlm_anchor_includes_stage1_and_patience(tmp_path):
    """Two-stage + early-stop parity: the sweep must run SimMLM's stage-1
    expert pretraining and freeze a candidate's record once cfg.patience
    epochs pass without improvement — otherwise swept candidates are tuned
    for a different regime than run_cross_validation would produce."""
    from multimodal_survival_prediction_tpu.config import SIMMLM

    td = tmp_path / "cohort"
    spec = SyntheticCohortSpec(n_patients=24, rna_dim=60, seed=11,
                               p_imaging=0.5, p_rnaseq=0.9,
                               image_shapes=((20, 24, 24),))
    table, paths = generate_synthetic_cohort(td, spec)
    cfg = SIMMLM.with_overrides(
        n_folds=2, batch_size=8, stage1_epochs=2, patience=2,
        image_shape=(16, 16, 8))
    _, o_seq = run_cross_validation(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"], num_epochs=6,
        backbone="simple_cnn", write_outputs=False)
    board = run_hyperparameter_sweep(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"], num_epochs=6,
        seeds=(cfg.seed,), backbone="simple_cnn")
    anchor = board[0]
    seq_hist = o_seq[0].history  # fold 1
    # patience parity: same (possibly early-stopped) history length
    assert len(anchor["history"]) == len(seq_hist)
    for ha, hb in zip(anchor["history"], seq_hist):
        assert abs(ha["val_c_index"] - hb["val_c_index"]) < 1e-4
        assert abs(ha["train_loss"] - hb["train_loss"]) < 1e-4
    assert anchor["best_epoch"] == o_seq[0].best_epoch
    assert abs(anchor["best_c_index"] - o_seq[0].best_c_index) < 1e-4


def test_sweep_on_mesh_writes_artifact(cohort, tmp_path):
    table, paths = cohort
    cfg = RNASEQ_ONLY.with_overrides(n_folds=3, batch_size=8)
    mesh = make_fold_mesh(4)
    board = run_hyperparameter_sweep(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"], num_epochs=2,
        seeds=(1, 2, 3), learning_rates=(1e-4,), mesh=mesh,
        results_dir=tmp_path / "results")
    assert len(board) == 3  # padded to 4 on device, dummy not reported
    with open(tmp_path / "results" / "rnaseq_only"
              / "sweep_results.json") as f:
        art = json.load(f)
    assert len(art["candidates"]) == 3
    assert all(np.isfinite(c["best_c_index"]) for c in art["candidates"])
