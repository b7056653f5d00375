"""Fold-parallel CV (train/cv_parallel.py): trajectory fidelity vs the
sequential driver, whole-step masking for unequal fold sizes, fold-mesh
sharding, early stopping, and SimMLM two-stage support."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_survival_prediction_tpu.config import (
    PARTIAL_MODALITY,
    RNASEQ_ONLY,
    SIMMLM,
)
from multimodal_survival_prediction_tpu.data.synthetic import (
    SyntheticCohortSpec,
    generate_synthetic_cohort,
)
from multimodal_survival_prediction_tpu.models import RNASeqSurvivalModel
from multimodal_survival_prediction_tpu.train.cv import run_cross_validation
from multimodal_survival_prediction_tpu.train.cv_parallel import (
    _build_parallel_train_epoch,
    _stack_fold_indices,
    _stack_states,
    make_fold_mesh,
    run_cross_validation_parallel,
)
from multimodal_survival_prediction_tpu.train.engine import (
    TrainConfig,
    Trainer,
)

pytestmark = pytest.mark.slow  # vmapped fold-parallel CV compiles (CLAUDE.md quick/slow split)

SMALL_IMG = (16, 16, 8)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    td = tmp_path_factory.mktemp("cohort_par")
    spec = SyntheticCohortSpec(n_patients=40, rna_dim=120, seed=3,
                               p_imaging=0.8, p_rnaseq=0.8,
                               image_shapes=((12, 20, 20), (10, 18, 18)))
    table, paths = generate_synthetic_cohort(td, spec)
    return table, paths


def test_parallel_epoch_matches_sequential_per_fold():
    """Two folds with UNEQUAL step counts (2 vs 3 steps at bs=8) trained by
    the vmapped fold-parallel epoch must land on the same parameters as two
    independent sequential epochs — the padded whole step must pass the
    shorter fold's state through untouched."""
    rng = np.random.default_rng(5)
    n, d, bs = 30, 48, 8
    data_np = {
        "rnaseq": rng.normal(size=(n, d)).astype(np.float32),
        "time": rng.exponential(300.0, size=n).astype(np.float32),
        "event": (rng.uniform(size=n) < 0.7).astype(np.float32),
        "svalid": np.ones(n, np.float32),
    }
    data = {k: jnp.asarray(v) for k, v in data_np.items()}
    rows_a = np.arange(15)        # 2 steps
    rows_b = np.arange(10, 30)    # 3 steps
    model = RNASeqSurvivalModel(hidden_dims=(32, 16))
    cfg = TrainConfig(batch_size=bs, optimizer="adamw")
    example = {k: v[:bs] for k, v in data.items()}
    example["valid"] = example["svalid"]

    # --- sequential oracle: one Trainer per independent fold run ---
    seq_params = []
    seq_losses = []
    for f, rows in ((1, rows_a), (2, rows_b)):
        tr = Trainer(model, lambda b: (b["rnaseq"],), None, cfg)
        state = tr.init_state(example, fold=f)
        key = jax.random.PRNGKey(3000 + f)
        shuffle = np.random.default_rng(100 + f)
        for _ in range(2):
            key, ek = jax.random.split(key)
            state, loss = tr.train_epoch(state, data, rows, shuffle,
                                         1e-3, ek)
        seq_params.append(jax.device_get(state.params))
        seq_losses.append(loss)

    # --- fold-parallel: same init/shuffle/dropout chains, one program ---
    tr = Trainer(model, lambda b: (b["rnaseq"],), None, cfg)
    stacked = _stack_states([tr.init_state(example, fold=1),
                             tr.init_state(example, fold=2)])
    fn = _build_parallel_train_epoch(tr)
    keys = jnp.stack([jax.random.PRNGKey(3001), jax.random.PRNGKey(3002)])
    shuffles = [np.random.default_rng(101), np.random.default_rng(102)]
    lr = jnp.full((2,), 1e-3, jnp.float32)
    for _ in range(2):
        split = jax.vmap(jax.random.split)(keys)
        keys, eks = split[:, 0], split[:, 1]
        idx, bv = _stack_fold_indices([rows_a, rows_b], bs, shuffles)
        stacked, losses = fn(stacked, data, jnp.asarray(idx),
                             jnp.asarray(bv), eks, lr)

    # unequal steps really happened (fold A padded from 2 to 3)
    assert bv.shape[1] == 3 and bv[0, 2].max() == 0.0 and bv[1, 2].max() == 1.0

    losses = np.asarray(losses)
    for k in range(2):
        assert abs(losses[k] - seq_losses[k]) < 1e-5
        par = jax.device_get(
            jax.tree_util.tree_map(lambda x: x[k], stacked.params))
        for a, b in zip(jax.tree_util.tree_leaves(seq_params[k]),
                        jax.tree_util.tree_leaves(par)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_parallel_cv_matches_sequential_driver(cohort, tmp_path):
    """Full-driver comparison: per-fold histories and best epochs from the
    fold-parallel driver must match the sequential driver."""
    table, paths = cohort
    cfg = RNASEQ_ONLY.with_overrides(n_folds=3, batch_size=8)
    kw = dict(rnaseq_csv=paths["rnaseq_csv"], num_epochs=3)
    p_seq, o_seq = run_cross_validation(
        cfg, table, results_dir=tmp_path / "rs", models_dir=tmp_path / "ms",
        **kw)
    p_par, o_par = run_cross_validation_parallel(
        cfg, table, results_dir=tmp_path / "rp", models_dir=tmp_path / "mp",
        **kw)
    assert len(o_par) == len(o_seq) == 3
    for a, b in zip(o_seq, o_par):
        assert a.train_size == b.train_size and a.val_size == b.val_size
        assert a.best_epoch == b.best_epoch
        assert abs(a.best_c_index - b.best_c_index) < 1e-4
        for ha, hb in zip(a.history, b.history):
            assert abs(ha["val_c_index"] - hb["val_c_index"]) < 1e-4
            assert abs(ha["train_loss"] - hb["train_loss"]) < 1e-4
    assert abs(p_seq["c_index_mean"] - p_par["c_index_mean"]) < 1e-4


def test_parallel_cv_streaming_matches_device(cohort, tmp_path):
    """Round-4 composition (VERDICT r3 #8): streaming fold-parallel — the
    cohort stays HOST-resident, stacked (K, B, ...) batches are prefetched
    per step, all folds advance together. Trajectories must EQUAL the
    device-resident fold-parallel driver (same key chain + whole-step
    masking), and the payload schema is unchanged."""
    table, paths = cohort
    cfg = RNASEQ_ONLY.with_overrides(n_folds=3, batch_size=8)
    kw = dict(rnaseq_csv=paths["rnaseq_csv"], num_epochs=3)
    p_dev, o_dev = run_cross_validation_parallel(
        cfg, table, results_dir=tmp_path / "rd", models_dir=tmp_path / "md",
        **kw)
    p_str, o_str = run_cross_validation_parallel(
        cfg, table, results_dir=tmp_path / "rs", models_dir=tmp_path / "ms",
        streaming=True, **kw)
    assert len(o_str) == len(o_dev) == 3
    for a, b in zip(o_dev, o_str):
        assert a.best_epoch == b.best_epoch
        assert abs(a.best_c_index - b.best_c_index) < 1e-4
        for ha, hb in zip(a.history, b.history):
            assert abs(ha["val_c_index"] - hb["val_c_index"]) < 1e-4
            assert abs(ha["train_loss"] - hb["train_loss"]) < 1e-4
    assert abs(p_dev["c_index_mean"] - p_str["c_index_mean"]) < 1e-4


def test_parallel_cv_streaming_on_fold_mesh(cohort, tmp_path):
    """Streaming fold-parallel under a fold mesh: stacked batches are
    device_put with a fold-axis sharding by the prefetcher; results match
    the unmeshed streaming run's schema and are finite."""
    table, paths = cohort
    mesh = make_fold_mesh(4)
    cfg = RNASEQ_ONLY.with_overrides(n_folds=3, batch_size=8)
    payload, outcomes = run_cross_validation_parallel(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"], num_epochs=2,
        results_dir=tmp_path / "r", models_dir=tmp_path / "m",
        mesh=mesh, streaming=True)
    assert len(outcomes) == 3
    assert np.isfinite(payload["c_index_mean"])
    for o in outcomes:
        assert np.isfinite(o.best_c_index)
        assert o.epochs_run == 2


def test_parallel_cv_on_fold_mesh(cohort, tmp_path):
    """3 folds sharded over a 4-device fold mesh (one dummy fold masked):
    the flagship partial-modality config incl. unlabeled-in-train."""
    table, paths = cohort
    mesh = make_fold_mesh(4)
    cfg = PARTIAL_MODALITY.with_overrides(
        n_folds=3, image_shape=SMALL_IMG, batch_size=4)
    payload, outcomes = run_cross_validation_parallel(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"], mesh=mesh,
        results_dir=tmp_path / "results", models_dir=tmp_path / "models",
        backbone="simple_cnn", num_epochs=2)
    assert np.isfinite(payload["c_index_mean"])
    n_unlabeled = int((~table.has_survival).sum())
    assert n_unlabeled > 0
    for fr in payload["fold_results"]:
        assert fr["train_size"] == fr["train_survival_size"] + n_unlabeled
    # best checkpoints written for real folds only
    import os

    names = os.listdir(tmp_path / "models" / "partial_modality")
    assert sorted(names) == sorted(
        [f"fold_{k}_best.msgpack" for k in (1, 2, 3)]
        + [f"fold_{k}_best.msgpack.meta.json" for k in (1, 2, 3)])


def test_parallel_cv_2d_fold_by_data_mesh(cohort, tmp_path):
    """(fold=2, data=4) 2-D mesh: 2 folds in flight, each batch-DP over 4
    devices (global Cox risk set + BatchNorm reduce across the inner axis).
    Results must match the unsharded vmap run (same trajectories)."""
    table, paths = cohort
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2, batch_size=8)
    kw = dict(rnaseq_csv=paths["rnaseq_csv"], num_epochs=2)
    p_2d, o_2d = run_cross_validation_parallel(
        cfg, table, mesh=make_fold_mesh(8, data_parallel=4),
        results_dir=tmp_path / "r2d", models_dir=tmp_path / "m2d", **kw)
    p_1d, o_1d = run_cross_validation_parallel(
        cfg, table, results_dir=tmp_path / "r1", models_dir=tmp_path / "m1",
        **kw)
    for a, b in zip(o_2d, o_1d):
        assert a.best_epoch == b.best_epoch
        assert abs(a.best_c_index - b.best_c_index) < 1e-4
        for ha, hb in zip(a.history, b.history):
            assert abs(ha["train_loss"] - hb["train_loss"]) < 1e-4
    assert np.isfinite(p_2d["c_index_mean"])


def test_parallel_cv_early_stop_per_fold(cohort, tmp_path):
    """patience=1 under the plateau scheduler: folds stop independently and
    their histories freeze at their own stop epoch."""
    table, paths = cohort
    cfg = RNASEQ_ONLY.with_overrides(
        n_folds=2, batch_size=8, scheduler="plateau", patience=1)
    payload, outcomes = run_cross_validation_parallel(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"],
        results_dir=tmp_path / "results", models_dir=tmp_path / "models",
        num_epochs=8)
    for o in outcomes:
        assert o.epochs_run <= 8
        assert len(o.history) == o.epochs_run
        assert o.best_epoch <= o.epochs_run


def test_parallel_cv_simmlm_two_stage(cohort, tmp_path):
    """SimMLM stage-1 expert pretraining runs vmapped before the main loop."""
    table, paths = cohort
    cfg = SIMMLM.with_overrides(n_folds=2, image_shape=SMALL_IMG,
                                batch_size=4, stage1_epochs=2)
    payload, _ = run_cross_validation_parallel(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"],
        results_dir=tmp_path / "results", models_dir=tmp_path / "models",
        backbone="simple_cnn", num_epochs=1)
    assert payload["hyperparameters"]["stage1_epochs"] == 2
    assert np.isfinite(payload["c_index_mean"])
