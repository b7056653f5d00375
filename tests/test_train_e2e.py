"""Synthetic-cohort integration tests: each training entry point end-to-end
for a couple of epochs on the CPU backend (SURVEY §4 items 3-4)."""

import json

import numpy as np
import pytest

from multimodal_survival_prediction_tpu.config import (
    FLEXIBLE_MULTIMODAL,
    IMAGE_ONLY,
    PARTIAL_MODALITY,
    RNASEQ_ONLY,
    SIMMLM,
)
from multimodal_survival_prediction_tpu.data.synthetic import (
    SyntheticCohortSpec,
    generate_synthetic_cohort,
)
from multimodal_survival_prediction_tpu.train.cv import run_cross_validation

SMALL_IMG = (16, 16, 8)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    td = tmp_path_factory.mktemp("cohort")
    spec = SyntheticCohortSpec(n_patients=40, rna_dim=120, seed=3,
                               p_imaging=0.8, p_rnaseq=0.8,
                               image_shapes=((12, 20, 20), (10, 18, 18)))
    table, paths = generate_synthetic_cohort(td, spec)
    return table, paths, td


def _run(cfg, cohort, tmp_path, **kw):
    table, paths, _ = cohort
    return run_cross_validation(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"],
        results_dir=tmp_path / "results", models_dir=tmp_path / "models",
        backbone="simple_cnn", **kw)


def test_rnaseq_only_e2e(cohort, tmp_path):
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2)
    payload, outcomes = _run(cfg, cohort, tmp_path, num_epochs=2)
    assert payload["model"] == "RNASeq-Only"
    assert len(payload["fold_results"]) == 2
    for fr in payload["fold_results"]:
        assert {"fold", "best_c_index", "best_epoch", "train_size",
                "val_size"} <= set(fr)
        assert 0.0 <= fr["best_c_index"] <= 1.0
    # file written and loadable
    with open(tmp_path / "results" / "rnaseq_only" / "cv_results.json") as f:
        on_disk = json.load(f)
    assert on_disk["c_index_mean"] == payload["c_index_mean"]


def test_image_only_e2e(cohort, tmp_path):
    cfg = IMAGE_ONLY.with_overrides(n_folds=2, image_shape=SMALL_IMG,
                                    batch_size=4)
    payload, _ = _run(cfg, cohort, tmp_path, num_epochs=2)
    # legacy schema: no top-level "model" key (SURVEY §2.8)
    assert "model" not in payload
    assert "c_index_mean" in payload


def test_partial_modality_e2e(cohort, tmp_path):
    cfg = PARTIAL_MODALITY.with_overrides(n_folds=2, image_shape=SMALL_IMG,
                                          batch_size=4)
    payload, outcomes = _run(cfg, cohort, tmp_path, num_epochs=2)
    table, _, _ = cohort
    n_unlabeled = int((~table.has_survival).sum())
    assert n_unlabeled > 0
    for fr in payload["fold_results"]:
        # unlabeled patients appended to every fold's train set
        assert fr["train_size"] == fr["train_survival_size"] + n_unlabeled
    assert payload["hyperparameters"]["gate_entropy_weight"] == 0.01


@pytest.mark.slow
def test_simmlm_e2e(cohort, tmp_path):
    cfg = SIMMLM.with_overrides(n_folds=2, image_shape=SMALL_IMG,
                                batch_size=4, stage1_epochs=2)
    payload, _ = _run(cfg, cohort, tmp_path, num_epochs=1)
    assert payload["hyperparameters"]["mofe_lambda"] == 0.1


def test_flexible_multimodal_e2e(cohort, tmp_path):
    cfg = FLEXIBLE_MULTIMODAL.with_overrides(n_folds=2, image_shape=SMALL_IMG,
                                             batch_size=8)
    payload, _ = _run(cfg, cohort, tmp_path, num_epochs=1)
    assert len(payload["fold_results"]) == 2


def test_rnaseq_only_on_mesh(cohort, tmp_path):
    """Batch-DP over the virtual 8-device CPU mesh must run and produce a
    valid result (collectives for the global Cox risk set included)."""
    from multimodal_survival_prediction_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2, batch_size=16)
    payload, _ = _run(cfg, cohort, tmp_path, num_epochs=2, mesh=mesh)
    assert np.isfinite(payload["c_index_mean"])


def test_seed42_splits_are_sklearn_kfold(cohort, tmp_path):
    """Fold assignment must be bit-identical to sklearn KFold(shuffle, 42)."""
    from sklearn.model_selection import KFold

    cfg = RNASEQ_ONLY.with_overrides(n_folds=3)
    payload, outcomes = _run(cfg, cohort, tmp_path, num_epochs=1)
    table, paths, _ = cohort
    import pandas as pd

    from multimodal_survival_prediction_tpu.data.datasets import (
        load_rnaseq_matrix,
        select_cohort,
    )

    cohort_df = select_cohort(table, "rnaseq_only")
    rna = load_rnaseq_matrix(paths["rnaseq_csv"])
    cohort_df = cohort_df[cohort_df.patient_id.isin(set(rna.index))]
    n = len(cohort_df)
    splits = list(KFold(3, shuffle=True, random_state=42).split(np.arange(n)))
    for fr, (tr, va) in zip(payload["fold_results"], splits):
        assert fr["train_size"] == len(tr)
        assert fr["val_size"] == len(va)


def test_rnaseq_only_tensor_parallel(cohort, tmp_path):
    """DP x TP mesh (4x2): wide RNA kernels column-sharded over 'model'."""
    from multimodal_survival_prediction_tpu.parallel import make_mesh

    mesh = make_mesh(8, model_parallel=2)
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2, batch_size=16)
    payload, _ = _run(cfg, cohort, tmp_path, num_epochs=1, mesh=mesh,
                      tensor_parallel=True)
    assert np.isfinite(payload["c_index_mean"])


@pytest.mark.slow
def test_resume_mid_cv(cohort, tmp_path):
    """Kill-and-resume: a run checkpointed every epoch must continue from
    where it stopped and produce the same artifacts as an uninterrupted run
    of the same length."""
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2)
    # pass 1: 2 epochs with resume checkpoints
    p1, _ = _run(cfg, cohort, tmp_path / "a", num_epochs=2, resume=True,
                 checkpoint_every=1)
    # pass 2: "crashed after epoch 2", resume to 4 epochs
    p2, outcomes2 = _run(cfg, cohort, tmp_path / "a", num_epochs=4,
                         resume=True, checkpoint_every=1)
    for o in outcomes2:
        assert o.epochs_run == 4
        assert o.history[0]["epoch"] == 1  # history preserved across resume
        assert len(o.history) == 4
    # uninterrupted control run
    p3, outcomes3 = _run(cfg, cohort, tmp_path / "b", num_epochs=4)
    assert len(outcomes3[0].history) == 4


def test_deterministic_given_seed(cohort, tmp_path):
    """Same seed, same data -> bit-identical fold results (the reference can't
    promise this; a jit-compiled functional pipeline can)."""
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2)
    p1, _ = _run(cfg, cohort, tmp_path / "r1", num_epochs=2)
    p2, _ = _run(cfg, cohort, tmp_path / "r2", num_epochs=2)
    assert p1["fold_results"] == p2["fold_results"]
    assert p1["c_index_mean"] == p2["c_index_mean"]


def test_fault_injection_corrupt_nifti(tmp_path):
    """A corrupt CT file must degrade to the missing-modality path (mask=0)
    and the run must still complete — the reference's failure semantics
    (silent except:pass, reference simple_fusion.py:130-131) but observable."""
    from pathlib import Path

    from multimodal_survival_prediction_tpu.data.datasets import (
        build_cohort_arrays,
        select_cohort,
    )

    spec = SyntheticCohortSpec(n_patients=20, rna_dim=60, seed=13,
                               p_imaging=0.9,
                               image_shapes=((10, 16, 16),))
    table, paths = generate_synthetic_cohort(tmp_path, spec)
    # corrupt the first imaging patient's file
    victim = table[table.has_imaging].iloc[0]
    Path(victim.nifti_path).write_bytes(b"garbage not nifti")

    cohort = select_cohort(table, "image_only")
    arrays = build_cohort_arrays(cohort, None, with_image=True,
                                 image_shape=(8, 8, 8))
    vi = arrays.index[victim.patient_id]
    assert arrays.arrays["mask"][vi, 0] == 0.0  # degraded to missing
    assert arrays.arrays["mask"][:, 0].sum() == len(cohort) - 1
    # and training still runs end to end
    cfg = IMAGE_ONLY.with_overrides(n_folds=2, image_shape=(8, 8, 8),
                                    batch_size=4)
    payload, _ = run_cross_validation(
        cfg, table, results_dir=tmp_path / "results",
        models_dir=tmp_path / "models", backbone="simple_cnn", num_epochs=1)
    assert np.isfinite(payload["c_index_mean"])


def test_bf16_training_runs(cohort, tmp_path):
    """bfloat16 encoder compute keeps the loss finite and the pipeline green
    (params/optimizer stay fp32; matches the --bf16 flag path)."""
    import jax.numpy as jnp

    cfg = RNASEQ_ONLY.with_overrides(n_folds=2)
    payload, _ = _run(cfg, cohort, tmp_path, num_epochs=2, dtype=jnp.bfloat16)
    assert np.isfinite(payload["c_index_mean"])
    assert 0.0 <= payload["c_index_mean"] <= 1.0


def test_streaming_epoch_matches_scan_epoch():
    """train_epoch_streaming (BatchPrefetcher host->device ingest, per-step
    jit) must produce the same trajectory as the device-resident scan epoch:
    identical batch order + identical per-step dropout-key chain."""
    import jax
    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.models import RNASeqSurvivalModel
    from multimodal_survival_prediction_tpu.train.engine import (
        TrainConfig,
        Trainer,
    )

    rng = np.random.default_rng(7)
    n, d = 20, 48  # n not a multiple of bs -> padded ragged tail exercised
    host_data = {
        "rnaseq": rng.normal(size=(n, d)).astype(np.float32),
        "time": rng.exponential(300.0, size=n).astype(np.float32),
        "event": (rng.uniform(size=n) < 0.7).astype(np.float32),
        "svalid": np.ones(n, np.float32),
    }
    model = RNASeqSurvivalModel(hidden_dims=(32, 16))
    cfg = TrainConfig(batch_size=8, optimizer="adamw", grad_clip=None)

    def run(streaming: bool):
        tr = Trainer(model, lambda b: (b["rnaseq"],), None, cfg)
        example = {k: v[:8] for k, v in host_data.items()}
        example["valid"] = example["svalid"]
        state = tr.init_state(example, fold=1)
        key = jax.random.PRNGKey(3)
        shuffle = np.random.default_rng(11)
        idx = np.arange(n)
        for _ in range(2):
            if streaming:
                state, loss = tr.train_epoch_streaming(
                    state, host_data, idx, shuffle, 1e-3, key)
            else:
                data = {k: jnp.asarray(v) for k, v in host_data.items()}
                state, loss = tr.train_epoch(state, data, idx, shuffle,
                                             1e-3, key)
        return jax.device_get(state.params), loss

    p_scan, l_scan = run(streaming=False)
    p_stream, l_stream = run(streaming=True)
    assert abs(l_scan - l_stream) < 1e-5
    flat_a = jax.tree_util.tree_leaves(p_scan)
    flat_b = jax.tree_util.tree_leaves(p_stream)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_densenet_flagship_under_dp_mesh():
    """The flagship CT encoder (DenseNet backbone) under the 8-device DP
    mesh: one train step of PartialModalityNet(backbone='densenet121') at
    (32,32,32) must run with the batch sharded, and the resulting BatchNorm
    statistics must match the single-device step (GSPMD computes BN moments
    over the GLOBAL batch, so sharding must not change them). Two dense
    blocks via block_config keep the CPU compile tolerable — the layer TYPES
    (conv0 7^3/s2, BN, bottleneck dense layers, transition avg-pool) are the
    full DenseNet121 path."""
    import jax
    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.models import PartialModalityNet
    from multimodal_survival_prediction_tpu.ops.cox import gate_entropy_loss
    from multimodal_survival_prediction_tpu.parallel import make_mesh
    from multimodal_survival_prediction_tpu.train.engine import (
        TrainConfig,
        Trainer,
    )

    rng = np.random.default_rng(17)
    n, rna_dim = 8, 64
    data_np = {
        "image": rng.normal(size=(n, 32, 32, 32, 1)).astype(np.float32),
        "rnaseq": rng.normal(size=(n, rna_dim)).astype(np.float32),
        "clinical": rng.uniform(0.3, 0.9, size=(n, 1)).astype(np.float32),
        "mask": (rng.uniform(size=(n, 3)) < 0.8).astype(np.float32),
        "time": rng.exponential(800.0, size=(n,)).astype(np.float32),
        "event": (rng.uniform(size=(n,)) < 0.6).astype(np.float32),
        "svalid": np.ones((n,), np.float32),
    }
    data_np["event"][:2] = 1.0
    model = PartialModalityNet(backbone="densenet121", block_config=(2, 2))

    def adapter(out, batch):
        hazard, gates = out
        return hazard, 0.01 * gate_entropy_loss(gates, valid=batch["valid"])

    def one_step(mesh):
        tr = Trainer(model,
                     lambda b: (b["image"], b["rnaseq"], b["clinical"],
                                b["mask"]),
                     adapter, TrainConfig(batch_size=8), mesh=mesh)
        example = dict(data_np)
        example["valid"] = example["svalid"]
        state = tr.init_state(example, fold=1)
        dev = {k: jnp.asarray(v) for k, v in data_np.items()}
        state, loss = tr.train_epoch(state, dev, np.arange(n),
                                     np.random.default_rng(5), 1e-4,
                                     jax.random.PRNGKey(2))
        return loss, jax.device_get(state.batch_stats)

    loss_mesh, bs_mesh = one_step(make_mesh(8))
    loss_one, bs_one = one_step(None)
    assert np.isfinite(loss_mesh)
    assert abs(loss_mesh - loss_one) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(bs_mesh),
                    jax.tree_util.tree_leaves(bs_one)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_full_densenet121_flagship_under_dp_mesh():
    """The FULL (6,12,24,16) DenseNet121 flagship encoder under the 8-device
    DP mesh (VERDICT r3 #4 stretch): one complete train step — fwd + Cox +
    gate-entropy + bwd + Adam — compiles and executes with the batch sharded,
    loss finite. The (2,2) variant above additionally pins BN-moment equality
    vs single-device; this test's job is the full 121-layer program under
    GSPMD (the deepest compile in the suite, hence one mesh run only)."""
    import jax
    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.models import PartialModalityNet
    from multimodal_survival_prediction_tpu.ops.cox import gate_entropy_loss
    from multimodal_survival_prediction_tpu.parallel import make_mesh
    from multimodal_survival_prediction_tpu.train.engine import (
        TrainConfig,
        Trainer,
    )

    rng = np.random.default_rng(23)
    n, rna_dim = 8, 64
    data_np = {
        "image": rng.normal(size=(n, 32, 32, 32, 1)).astype(np.float32),
        "rnaseq": rng.normal(size=(n, rna_dim)).astype(np.float32),
        "clinical": rng.uniform(0.3, 0.9, size=(n, 1)).astype(np.float32),
        "mask": (rng.uniform(size=(n, 3)) < 0.8).astype(np.float32),
        "time": rng.exponential(800.0, size=(n,)).astype(np.float32),
        "event": (rng.uniform(size=(n,)) < 0.6).astype(np.float32),
        "svalid": np.ones((n,), np.float32),
    }
    data_np["event"][:2] = 1.0
    model = PartialModalityNet(backbone="densenet121")  # full block config

    def adapter(out, batch):
        hazard, gates = out
        return hazard, 0.01 * gate_entropy_loss(gates, valid=batch["valid"])

    tr = Trainer(model,
                 lambda b: (b["image"], b["rnaseq"], b["clinical"],
                            b["mask"]),
                 adapter, TrainConfig(batch_size=8), mesh=make_mesh(8))
    example = dict(data_np)
    example["valid"] = example["svalid"]
    state = tr.init_state(example, fold=1)
    dev = {k: jnp.asarray(v) for k, v in data_np.items()}
    state, loss = tr.train_epoch(state, dev, np.arange(n),
                                 np.random.default_rng(7), 1e-4,
                                 jax.random.PRNGKey(3))
    assert np.isfinite(loss)
    assert int(jax.device_get(state.step)) == 1


def test_streaming_cv_driver_matches_device_resident(cohort, tmp_path):
    """run_cross_validation(streaming=True) — the --streaming CLI path —
    keeps the cohort host-resident and must reproduce the device-resident
    driver's fold results (same batch order + per-step dropout chain; the
    streaming eval pools the same hazards)."""
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2)
    _, o_dev = _run(cfg, cohort, tmp_path / "dev", num_epochs=2,
                    write_outputs=False)
    _, o_str = _run(cfg, cohort, tmp_path / "str", num_epochs=2,
                    write_outputs=False, streaming=True)
    for a, b in zip(o_dev, o_str):
        assert abs(a.best_c_index - b.best_c_index) < 1e-5
        for ha, hb in zip(a.history, b.history):
            assert abs(ha["train_loss"] - hb["train_loss"]) < 1e-5
            assert abs(ha["val_c_index"] - hb["val_c_index"]) < 1e-5


@pytest.mark.slow
def test_resume_restores_tp_shardings(cohort, tmp_path):
    """Resume under a DP x TP mesh must put restored leaves back onto their
    original shardings (wide RNA kernels on the 'model' axis), not
    replicate them (round-1 known gap)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from multimodal_survival_prediction_tpu.parallel import make_mesh

    mesh = make_mesh(8, model_parallel=2)
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2, batch_size=16)
    _run(cfg, cohort, tmp_path, num_epochs=1, mesh=mesh,
         tensor_parallel=True, resume=True, checkpoint_every=1)
    p2, outcomes = _run(cfg, cohort, tmp_path, num_epochs=2, mesh=mesh,
                        tensor_parallel=True, resume=True, checkpoint_every=1)
    assert np.isfinite(p2["c_index_mean"])
    for o in outcomes:
        assert o.epochs_run == 2

    # the mechanic itself, discriminating: restored-onto-old-sharding keeps
    # the TP spec (a replicate() would not)
    from multimodal_survival_prediction_tpu.config import RNASEQ_ONLY as C
    from multimodal_survival_prediction_tpu.train.adapters import (
        make_model_and_adapters,
    )
    from multimodal_survival_prediction_tpu.train.engine import (
        TrainConfig,
        Trainer,
        TrainState,
    )

    model, b2i, haz = make_model_and_adapters(C, rna_dim=640)
    tr = Trainer(model, b2i, haz, TrainConfig(batch_size=8), mesh=mesh,
                 tensor_parallel=True)
    example = {
        "rnaseq": np.zeros((8, 640), np.float32),
        "time": np.ones(8, np.float32),
        "event": np.ones(8, np.float32),
        "svalid": np.ones(8, np.float32),
        "valid": np.ones(8, np.float32),
    }
    state = tr.init_state(example, fold=1)
    restored = TrainState(**jax.device_get(
        {"params": state.params, "batch_stats": state.batch_stats,
         "opt_state": state.opt_state, "step": state.step}))
    state2 = jax.tree_util.tree_map(
        lambda new, old: jax.device_put(new, old.sharding), restored, state)
    k = state2.params["block0"]["linear"]["dense"]["kernel"]
    assert "model" in str(k.sharding.spec), k.sharding


def test_prepared_data_path_is_equivalent(cohort, tmp_path):
    """run_cross_validation(prepared=...) must reproduce the internal
    prepare_cv_data path bit-for-bit (the parity harness feeds pre-built
    arrays to skip a second cohort ingest)."""
    from multimodal_survival_prediction_tpu.train.cv import prepare_cv_data

    table, paths, _ = cohort
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2)
    _, o_internal = _run(cfg, cohort, tmp_path, num_epochs=2,
                         write_outputs=False)
    prepared = prepare_cv_data(cfg, table, rnaseq_csv=paths["rnaseq_csv"])
    _, o_prepared = run_cross_validation(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"], num_epochs=2,
        backbone="simple_cnn", write_outputs=False, prepared=prepared)
    for a, b in zip(o_internal, o_prepared):
        assert a.best_c_index == b.best_c_index
        assert a.best_epoch == b.best_epoch
        assert a.history == b.history


@pytest.mark.slow
def test_efron_ties_mode_end_to_end(cohort, tmp_path):
    """cfg.ties='efron' flows through the CV driver: on a tied-heavy cohort
    it trains to a different (finite) trajectory than Breslow; without ties
    the two losses coincide at the op level (tests/test_cox.py)."""
    table, paths, _ = cohort
    tied = table.copy()
    tied["survival_time"] = (tied.survival_time // 300.0) * 300.0 + 10.0
    cfg_b = RNASEQ_ONLY.with_overrides(n_folds=2)
    cfg_e = RNASEQ_ONLY.with_overrides(n_folds=2, ties="efron")
    _, o_b = run_cross_validation(
        cfg_b, tied, rnaseq_csv=paths["rnaseq_csv"], num_epochs=2,
        backbone="simple_cnn", write_outputs=False)
    _, o_e = run_cross_validation(
        cfg_e, tied, rnaseq_csv=paths["rnaseq_csv"], num_epochs=2,
        backbone="simple_cnn", write_outputs=False)
    hb = [h["train_loss"] for h in o_b[0].history]
    he = [h["train_loss"] for h in o_e[0].history]
    assert np.all(np.isfinite(hb)) and np.all(np.isfinite(he))
    assert hb != he  # ties actually engage the Efron correction


def test_eval_with_stage1_three_tuple_adapter():
    """Trainer.evaluate must accept adapters returning (hazard, aux,
    main_scale) — the SimMLM stage-1 contract the loss path already handles
    — not just 2-tuples (the eval scan used to unpack exactly two values
    and crashed on a stage-1 trainer)."""
    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.models import SimMLMSurvivalNet
    from multimodal_survival_prediction_tpu.train.adapters import (
        simmlm_stage1_adapter,
    )
    from multimodal_survival_prediction_tpu.train.engine import (
        TrainConfig,
        Trainer,
    )

    rng = np.random.default_rng(5)
    n = 16
    data = {
        "image": rng.normal(size=(n, 8, 8, 8, 1)).astype(np.float32),
        "rnaseq": rng.normal(size=(n, 20)).astype(np.float32),
        "clinical": rng.normal(size=(n, 1)).astype(np.float32),
        "mask": np.ones((n, 3), np.float32),
        "time": rng.exponential(300.0, size=n).astype(np.float32),
        "event": (rng.uniform(size=n) < 0.7).astype(np.float32),
        "svalid": np.ones(n, np.float32),
    }
    data["valid"] = data["svalid"]
    model = SimMLMSurvivalNet(backbone="simple_cnn")
    tr = Trainer(
        model,
        lambda b: (b["image"], b["rnaseq"], b["clinical"], b["mask"]),
        simmlm_stage1_adapter(), TrainConfig(batch_size=8))
    example = {k: v[:8] for k, v in data.items()}
    state = tr.init_state(example, fold=1)
    dev = {k: jnp.asarray(v) for k, v in data.items()}
    cindex, loss, hazards = tr.evaluate(state, dev, np.arange(n))
    assert np.isfinite(loss) and hazards.shape == (n,)
    assert 0.0 <= cindex <= 1.0
