"""cv_results.json schema parity tests (SURVEY §4 item 5, §2.8)."""

import json

from multimodal_survival_prediction_tpu.io.results import (
    load_cv_results,
    write_cv_results,
)

FOLDS = [
    {"fold": 1, "best_c_index": 0.61, "best_epoch": 13, "train_size": 176,
     "val_size": 88},
    {"fold": 2, "best_c_index": 0.59, "best_epoch": 35, "train_size": 176,
     "val_size": 88},
]


def test_standard_schema(tmp_path):
    payload = write_cv_results(
        tmp_path, "RNASeq-Only", FOLDS,
        hyperparameters={"batch_size": 16, "learning_rate": 1e-4,
                         "epochs": 50, "n_folds": 3},
        extra={"n_folds": 3, "num_epochs": 50, "dataset_size": 264},
    )
    on_disk = json.load(open(tmp_path / "cv_results.json"))
    # key order and structure of the standard variant
    assert list(on_disk)[:4] == ["model", "n_folds", "num_epochs",
                                 "dataset_size"]
    assert on_disk["model"] == "RNASeq-Only"
    assert on_disk["c_index_mean"] == payload["c_index_mean"]
    assert isinstance(on_disk["fold_results"], list)
    assert on_disk["hyperparameters"]["batch_size"] == 16


def test_legacy_schema(tmp_path):
    write_cv_results(tmp_path, None, FOLDS, legacy=True)
    on_disk = json.load(open(tmp_path / "cv_results.json"))
    assert "model" not in on_disk
    assert "hyperparameters" not in on_disk
    assert {"c_index_mean", "c_index_std", "fold_results"} <= set(on_disk)


def test_tolerant_reader_both_variants(tmp_path):
    a = tmp_path / "std"
    b = tmp_path / "legacy"
    write_cv_results(a, "X", FOLDS, hyperparameters={"batch_size": 8})
    write_cv_results(b, None, FOLDS, legacy=True)
    ra = load_cv_results(a)
    rb = load_cv_results(b)
    assert ra["model"] == "X"
    assert rb["model"] == "legacy"  # falls back to directory name
    assert ra["fold_scores"] == rb["fold_scores"] == [0.61, 0.59]
    assert abs(ra["c_index_mean"] - 0.6) < 1e-9


def test_std_is_population_std(tmp_path):
    import numpy as np

    payload = write_cv_results(tmp_path, "X", FOLDS)
    assert payload["c_index_std"] == float(np.std([0.61, 0.59]))
