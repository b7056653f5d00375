"""Torch-checkpoint import: reference ``.pth`` state_dicts must load into
this framework's models and produce the SAME scores the torch model does.

Oracles: ``benchmarks/torch_reference_named.py`` — torch twins whose
state_dict KEYS exactly match the reference classes (MONAI DenseNet121
layout for the flagship CT encoder). Each test trains the torch model
briefly (so weights AND BatchNorm running stats are non-trivial), saves a
real ``.pth``, imports it, and compares eval-mode forwards."""

import numpy as np
import pytest
import torch

from benchmarks.torch_reference_named import (
    build_reference_named_partial_modality,
    build_reference_named_rnaseq,
)
from multimodal_survival_prediction_tpu.io.torch_import import (
    import_torch_checkpoint,
    validate_against_model,
)


def _train_steps(model, make_batch, n_steps=2):
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    model.train()
    for _ in range(n_steps):
        opt.zero_grad()
        out = model(*make_batch())
        h = out[0] if isinstance(out, tuple) else out
        h.square().mean().backward()
        opt.step()
    model.eval()


def test_import_rnaseq_matches_torch_forward(tmp_path):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    rna_dim, n = 30, 12
    model = build_reference_named_rnaseq(rna_dim, hidden=(1024, 512, 256))
    X = rng.normal(size=(n, rna_dim)).astype(np.float32)
    _train_steps(model, lambda: (torch.asarray(X),))
    path = tmp_path / "fold_1_best.pth"
    torch.save(model.state_dict(), path)

    with torch.no_grad():
        oracle = model(torch.asarray(X)).squeeze(1).numpy()

    variables, backbone = import_torch_checkpoint("rnaseq_only", path)
    assert backbone is None

    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.models import RNASeqSurvivalModel

    jmodel = RNASeqSurvivalModel()
    validate_against_model(variables, jmodel, (jnp.asarray(X),))
    got = np.asarray(jmodel.apply(variables, jnp.asarray(X), train=False))
    np.testing.assert_allclose(got, oracle, atol=1e-5)


@pytest.mark.parametrize("use_monai,backbone,shape", [
    pytest.param(True, "densenet121", (32, 32, 32),
                 marks=pytest.mark.slow),  # ~50s full-DenseNet CPU compile
    (False, "simple_cnn", (16, 16, 8)),
])
def test_import_partial_modality_matches_torch_forward(
        tmp_path, use_monai, backbone, shape):
    """Flagship import, both CT backbones. The MONAI case exercises every
    dense block / transition / head mapping plus the ``.layers.`` key
    normalization; the fallback case the Sequential-index fallback encoder.
    Hazards AND gates must match the torch eval forward."""
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    rna_dim, n = 20, 3
    model = build_reference_named_partial_modality(
        rna_dim=rna_dim, use_monai=use_monai)
    ct = rng.normal(size=(n, 1, *shape)).astype(np.float32)
    rna = rng.normal(size=(n, rna_dim)).astype(np.float32)
    clin = rng.normal(size=(n, 1)).astype(np.float32)
    mask = np.asarray([[1, 1, 1], [0, 1, 1], [1, 0, 1]], np.float32)
    batch = (torch.asarray(ct), torch.asarray(rna), torch.asarray(clin),
             torch.asarray(mask))
    _train_steps(model, lambda: batch, n_steps=1)
    path = tmp_path / "fold_1_best.pth"
    torch.save(model.state_dict(), path)

    with torch.no_grad():
        oracle_h, oracle_g = (x.numpy() for x in model(*batch))

    # backbone auto-detection from the keys
    variables, detected = import_torch_checkpoint("partial_modality", path)
    assert detected == backbone

    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.models import PartialModalityNet

    jmodel = PartialModalityNet(backbone=backbone)
    # channels-last image for the flax side — same bytes, moved axis
    jct = jnp.asarray(np.moveaxis(ct, 1, -1))
    inputs = (jct, jnp.asarray(rna), jnp.asarray(clin), jnp.asarray(mask))
    validate_against_model(variables, jmodel, inputs)
    got_h, got_g = jmodel.apply(variables, *inputs, train=False)
    np.testing.assert_allclose(np.asarray(got_g), oracle_g, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_h), oracle_h, atol=2e-4)


def test_import_simple_fusion_densenet_matches_torch_forward(tmp_path):
    """simple_fusion with the MONAI backbone under its OTHER attribute name
    ('image_encoder', not 'ct_encoder') — covers the deep RNA encoder, the
    3-layer fusion head, and the encoder-prefix plumbing."""
    from benchmarks.torch_reference_named import (
        build_reference_named_simple_fusion,
    )

    torch.manual_seed(4)
    rng = np.random.default_rng(4)
    rna_dim, n, shape = 18, 3, (32, 32, 32)
    model = build_reference_named_simple_fusion(rna_dim, use_monai=True)
    ct = rng.normal(size=(n, 1, *shape)).astype(np.float32)
    rna = rng.normal(size=(n, rna_dim)).astype(np.float32)
    batch = (torch.asarray(ct), torch.asarray(rna))
    _train_steps(model, lambda: batch, n_steps=1)
    path = tmp_path / "fold_1_best.pth"
    torch.save(model.state_dict(), path)
    with torch.no_grad():
        oracle = model(*batch).numpy()

    variables, detected = import_torch_checkpoint("simple_fusion", path)
    assert detected == "densenet121"

    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.models import SimpleFusionModel

    jmodel = SimpleFusionModel(backbone="densenet121")
    inputs = (jnp.asarray(np.moveaxis(ct, 1, -1)), jnp.asarray(rna))
    validate_against_model(variables, jmodel, inputs)
    got = np.asarray(jmodel.apply(variables, *inputs, train=False))
    np.testing.assert_allclose(got, oracle, atol=2e-4)


@pytest.mark.parametrize("family", ["flexible_multimodal", "final"])
def test_import_fusion_families_match_torch_forward(tmp_path, family):
    """flexible_multimodal (learnable missing-modality biases) and final
    (3-modality late fusion), fallback-CNN backbone for speed (the DenseNet
    mapping is covered by the flagship/simple_fusion tests)."""
    from benchmarks.torch_reference_named import (
        build_reference_named_final,
        build_reference_named_flexible,
    )

    torch.manual_seed(5)
    rng = np.random.default_rng(5)
    rna_dim, n, shape = 15, 4, (16, 16, 8)
    ct = rng.normal(size=(n, 1, *shape)).astype(np.float32)
    rna = rng.normal(size=(n, rna_dim)).astype(np.float32)

    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.models import (
        FlexibleMultimodalModel,
        MultiModalSurvivalNet,
    )

    if family == "flexible_multimodal":
        model = build_reference_named_flexible(rna_dim, use_monai=False)
        mask = np.asarray([[1, 1], [0, 1], [1, 0], [0, 0]], np.float32)
        batch = (torch.asarray(ct), torch.asarray(rna), torch.asarray(mask))
        jmodel = FlexibleMultimodalModel(backbone="simple_cnn")
        jinputs = (jnp.asarray(np.moveaxis(ct, 1, -1)), jnp.asarray(rna),
                   jnp.asarray(mask))
    else:
        model = build_reference_named_final(rna_dim, use_monai=False)
        clin = rng.normal(size=(n, 1)).astype(np.float32)
        batch = (torch.asarray(ct), torch.asarray(rna), torch.asarray(clin))
        jmodel = MultiModalSurvivalNet(backbone="simple_cnn")
        jinputs = (jnp.asarray(np.moveaxis(ct, 1, -1)), jnp.asarray(rna),
                   jnp.asarray(clin))

    _train_steps(model, lambda: batch, n_steps=1)
    path = tmp_path / "fold_1_best.pth"
    torch.save(model.state_dict(), path)
    with torch.no_grad():
        oracle = model(*batch).numpy()

    variables, detected = import_torch_checkpoint(family, path)
    assert detected == "simple_cnn"
    validate_against_model(variables, jmodel, jinputs)
    got = np.asarray(jmodel.apply(variables, *jinputs, train=False))
    np.testing.assert_allclose(got, oracle, atol=2e-4)


def test_import_image_only_matches_torch_forward(tmp_path):
    from benchmarks.torch_reference_named import (
        build_reference_named_image_only,
    )

    torch.manual_seed(6)
    rng = np.random.default_rng(6)
    n, shape = 4, (16, 16, 8)
    model = build_reference_named_image_only()
    ct = rng.normal(size=(n, 1, *shape)).astype(np.float32)
    batch = (torch.asarray(ct),)
    _train_steps(model, lambda: batch, n_steps=1)
    path = tmp_path / "fold_1_best.pth"
    torch.save(model.state_dict(), path)
    with torch.no_grad():
        oracle = model(*batch).numpy()

    variables, detected = import_torch_checkpoint("image_only", path)
    assert detected is None  # fixed architecture, no backbone choice

    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.models import ImageOnlyModel

    jmodel = ImageOnlyModel()
    inputs = (jnp.asarray(np.moveaxis(ct, 1, -1)),)
    validate_against_model(variables, jmodel, inputs)
    got = np.asarray(jmodel.apply(variables, *inputs, train=False))
    np.testing.assert_allclose(got, oracle, atol=2e-4)


def test_import_simmlm_matches_torch_forward(tmp_path):
    """SimMLM: all three expert encoders, per-expert cox heads, the 3-layer
    gating MLP with masked softmax, and the ensemble head. Ensemble hazard,
    expert hazards AND gates must match the torch eval forward (rows with at
    least one modality — the all-missing row is this framework's documented
    NaN fix and differs from the reference's NaN)."""
    from benchmarks.torch_reference_named import build_reference_named_simmlm

    torch.manual_seed(7)
    rng = np.random.default_rng(7)
    rna_dim, n, shape = 12, 3, (16, 16, 8)
    model = build_reference_named_simmlm(rna_dim, use_monai=False)
    ct = rng.normal(size=(n, 1, *shape)).astype(np.float32)
    rna = rng.normal(size=(n, rna_dim)).astype(np.float32)
    clin = rng.normal(size=(n, 1)).astype(np.float32)
    mask = np.asarray([[1, 1, 1], [0, 1, 0], [1, 0, 1]], np.float32)
    batch = (torch.asarray(ct), torch.asarray(rna), torch.asarray(clin),
             torch.asarray(mask))
    _train_steps(model, lambda: batch, n_steps=1)
    path = tmp_path / "fold_1_best.pth"
    torch.save(model.state_dict(), path)
    with torch.no_grad():
        o_ens, o_exp, o_g = (x.numpy() for x in model(*batch))

    variables, detected = import_torch_checkpoint("simmim", path)
    assert detected == "simple_cnn"

    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.models import SimMLMSurvivalNet

    jmodel = SimMLMSurvivalNet(backbone="simple_cnn")
    inputs = (jnp.asarray(np.moveaxis(ct, 1, -1)), jnp.asarray(rna),
              jnp.asarray(clin), jnp.asarray(mask))
    validate_against_model(variables, jmodel, inputs)
    ens, exp, g = jmodel.apply(variables, *inputs, train=False)
    np.testing.assert_allclose(np.asarray(g), o_g, atol=2e-4)
    np.testing.assert_allclose(np.asarray(exp), o_exp, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ens), o_ens, atol=2e-4)


def _init_family(family, backbone="simple_cnn", rna_dim=8,
                 shape=(16, 16, 8)):
    """Tiny real init of a family's flax model + the example inputs."""
    import jax
    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.config import ALL_CONFIGS
    from multimodal_survival_prediction_tpu.train.adapters import (
        make_model_and_adapters,
    )

    cfg = ALL_CONFIGS[family]
    model, batch_to_inputs, _ = make_model_and_adapters(cfg,
                                                        backbone=backbone)
    b = {"image": jnp.zeros((2, *shape, 1), jnp.float32),
         "rnaseq": jnp.ones((2, rna_dim), jnp.float32),
         "clinical": jnp.ones((2, 1), jnp.float32),
         "mask": jnp.ones((2, 3), jnp.float32),
         "time": jnp.ones((2,), jnp.float32),
         "event": jnp.ones((2,), jnp.float32),
         "svalid": jnp.ones((2,), jnp.float32),
         "valid": jnp.ones((2,), jnp.float32)}
    inputs = batch_to_inputs(b)
    variables = model.init({"params": jax.random.PRNGKey(9),
                            "dropout": jax.random.PRNGKey(9)},
                           *inputs, train=False)
    return model, inputs, jax.device_get(dict(variables))


@pytest.mark.parametrize("family", [
    "rnaseq_only", "image_only", "partial_modality", "simple_fusion",
    "flexible_multimodal", "final", "simmim"])
def test_export_import_roundtrip(family):
    """export∘import must be the identity on every leaf, every family —
    this pins the import and export maps to each other permanently."""
    import jax

    from multimodal_survival_prediction_tpu.io.torch_import import (
        _IMAGE_FAMILIES,
        export_torch_state_dict,
    )
    from multimodal_survival_prediction_tpu.io.torch_import import (
        _IMPORTERS as IMPORTERS,
    )

    _, _, variables = _init_family(family)
    sd = export_torch_state_dict(family, variables)
    if family in _IMAGE_FAMILIES:
        back = IMPORTERS[family](sd, backbone="simple_cnn")
    else:
        back = IMPORTERS[family](sd)
    flat_a = jax.tree_util.tree_leaves_with_path(
        {"params": variables["params"],
         "batch_stats": dict(variables.get("batch_stats", {}))})
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(leaf), flat_b.pop(key),
                                      err_msg=key)
    assert not flat_b  # no extra leaves materialized


@pytest.mark.slow
def test_export_import_roundtrip_densenet():
    """The MONAI DenseNet121 export path (every dense block / transition /
    head key) — roundtrip at the 32^3 minimum input."""
    import jax

    from multimodal_survival_prediction_tpu.io.torch_import import (
        export_torch_state_dict,
        import_partial_modality_state_dict,
    )

    _, _, variables = _init_family("partial_modality",
                                   backbone="densenet121",
                                   shape=(32, 32, 32))
    sd = export_torch_state_dict("partial_modality", variables)
    assert any(".layers." in k for k in sd)  # MONAI nesting emitted
    back = import_partial_modality_state_dict(sd, backbone="densenet121")
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            {"params": variables["params"],
             "batch_stats": dict(variables["batch_stats"])}):
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(leaf), flat_b.pop(key),
                                      err_msg=key)
    assert not flat_b


def test_export_loads_into_torch_strict():
    """An exported state_dict must load into the reference-named torch class
    with strict=True and produce the flax model's eval scores — the full
    hand-back-to-torch direction."""
    from multimodal_survival_prediction_tpu.io.torch_import import (
        export_torch_state_dict,
    )

    jmodel, inputs, variables = _init_family("partial_modality")
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(
              "partial_modality", variables).items()}
    tmodel = build_reference_named_partial_modality(rna_dim=8,
                                                    use_monai=False)
    tmodel.load_state_dict(sd, strict=True)
    tmodel.eval()

    flax_h, flax_g = jmodel.apply(variables, *inputs, train=False)
    ct = torch.asarray(np.moveaxis(np.asarray(inputs[0]), -1, 1))
    with torch.no_grad():
        t_h, t_g = tmodel(ct, torch.asarray(np.asarray(inputs[1])),
                          torch.asarray(np.asarray(inputs[2])),
                          torch.asarray(np.asarray(inputs[3])))
    np.testing.assert_allclose(np.asarray(flax_h), t_h.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(flax_g), t_g.numpy(), atol=2e-4)


def test_import_wrong_family_raises(tmp_path):
    torch.manual_seed(2)
    model = build_reference_named_rnaseq(10, hidden=(1024, 512, 256))
    path = tmp_path / "rna.pth"
    torch.save(model.state_dict(), path)
    with pytest.raises((KeyError, ValueError)):
        import_torch_checkpoint("partial_modality", path)


def test_import_dataparallel_and_wrapped_state_dicts(tmp_path):
    """Common real-world variants: nn.DataParallel 'module.' prefixes and
    a {'state_dict': ...} wrapper dict must both load."""
    torch.manual_seed(10)
    model = build_reference_named_rnaseq(9, hidden=(1024, 512, 256))
    model.eval()
    base, _ = import_torch_checkpoint(
        "rnaseq_only",
        _save(tmp_path / "a.pth", model.state_dict()))
    wrapped, _ = import_torch_checkpoint(
        "rnaseq_only",
        _save(tmp_path / "b.pth", {"state_dict": model.state_dict()}))
    dp, _ = import_torch_checkpoint(
        "rnaseq_only",
        _save(tmp_path / "c.pth",
              {f"module.{k}": v for k, v in model.state_dict().items()}))
    import jax

    for other in (wrapped, dp):
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(base),
                jax.tree_util.tree_leaves_with_path(other)):
            np.testing.assert_array_equal(a, b,
                                          err_msg=jax.tree_util.keystr(pa))


def _save(path, obj):
    torch.save(obj, path)
    return path


def test_converted_checkpoint_serves(tmp_path):
    """A converted checkpoint must also work through the serving layer
    (RiskScorer reads the converter's .meta.json for backbone/rna_dim)."""
    from multimodal_survival_prediction_tpu.io.checkpoint import (
        save_checkpoint,
        save_fold_meta,
    )
    from multimodal_survival_prediction_tpu.serving import RiskScorer

    torch.manual_seed(8)
    rna_dim = 16
    model = build_reference_named_rnaseq(rna_dim, hidden=(1024, 512, 256))
    x = np.random.default_rng(8).normal(size=(1, rna_dim)).astype(np.float32)
    _train_steps(model, lambda: (torch.asarray(np.repeat(x, 4, 0)),))
    with torch.no_grad():
        oracle = float(model(torch.asarray(x)).squeeze())

    pth = tmp_path / "fold_1_best.pth"
    torch.save(model.state_dict(), pth)
    variables, _ = import_torch_checkpoint("rnaseq_only", pth)
    out = tmp_path / "fold_1_best.msgpack"
    save_checkpoint(out, variables)
    save_fold_meta(out, model="rnaseq_only", backbone=None,
                   image_shape=[16, 16, 8], rna_dim=rna_dim, hu_window=None,
                   use_pallas_resample=False, ties="breslow",
                   imported_from=str(pth))

    scorer = RiskScorer("rnaseq_only", out)
    got = scorer.score(rnaseq=x[0])
    assert abs(got["risk_score"] - oracle) < 1e-4


def test_converted_checkpoint_scores_like_torch(tmp_path):
    """End-to-end migration: .pth -> converter CLI -> predict_risk on a
    synthetic cohort must reproduce the torch model's eval scores (the full
    reference-user migration path, no retraining)."""
    import subprocess
    import sys
    from pathlib import Path

    REPO_ROOT = Path(__file__).resolve().parents[1]

    import os

    from multimodal_survival_prediction_tpu.config import RNASEQ_ONLY
    from multimodal_survival_prediction_tpu.data.datasets import (
        build_cohort_arrays,
        load_rnaseq_matrix,
        select_cohort,
    )
    from multimodal_survival_prediction_tpu.data.matching_table import (
        load_matching_table,
    )
    from multimodal_survival_prediction_tpu.data.synthetic import (
        SyntheticCohortSpec,
        generate_synthetic_cohort,
    )
    from multimodal_survival_prediction_tpu.train.predict import predict_risk

    spec = SyntheticCohortSpec(n_patients=10, rna_dim=25, seed=3,
                               p_imaging=0.0, p_rnaseq=1.0)
    table, paths = generate_synthetic_cohort(tmp_path, spec)
    table = load_matching_table(
        tmp_path / "data" / "processed" / "full_matching_table.csv")
    cohort = select_cohort(table, "rnaseq_only")
    rnaseq_df = load_rnaseq_matrix(paths["rnaseq_csv"])
    arrays = build_cohort_arrays(cohort, rnaseq_df, with_image=False)
    X = arrays.arrays["rnaseq"]

    torch.manual_seed(3)
    model = build_reference_named_rnaseq(X.shape[1], hidden=(1024, 512, 256))
    _train_steps(model, lambda: (torch.asarray(X),))
    pth = tmp_path / "fold_1_best.pth"
    torch.save(model.state_dict(), pth)
    with torch.no_grad():
        oracle = model(torch.asarray(X)).squeeze(1).numpy()

    out = tmp_path / "converted" / "fold_1_best.msgpack"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run(
        [sys.executable,
         str(REPO_ROOT / "scripts" / "tools" / "convert_torch_checkpoint.py"),
         "--model", "rnaseq_only", "--torch-checkpoint", str(pth),
         "--out", str(out)],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and (tmp_path / "converted"
                             / "fold_1_best.msgpack.meta.json").exists()

    pred = predict_risk(RNASEQ_ONLY, out, table,
                        rnaseq_csv=paths["rnaseq_csv"], labeled_only=False)
    np.testing.assert_allclose(pred.risk_score.to_numpy(), oracle, atol=1e-4)
