"""Model fidelity tests: shapes, parameter-count parity with a torch twin of
the reference architectures, init distributions, checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_survival_prediction_tpu.models import (
    DenseNet121_3D,
    FlexibleMultimodalModel,
    ImageOnlyModel,
    MMsurvNet,
    MultiModalSurvivalNet,
    PartialModalityNet,
    RNASeqSurvivalModel,
    SimMLMSurvivalNet,
    SimpleFusionModel,
)
from multimodal_survival_prediction_tpu.utils import param_count

B, IMG, RNA = 2, (16, 16, 8), 64


def _init(model, *inputs):
    rng = jax.random.PRNGKey(0)
    return model.init({"params": rng, "dropout": rng}, *inputs, train=False)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return dict(
        image=jnp.asarray(rng.normal(size=(B, *IMG, 1)), jnp.float32),
        rnaseq=jnp.asarray(rng.normal(size=(B, RNA)), jnp.float32),
        clinical=jnp.asarray(rng.uniform(size=(B, 1)), jnp.float32),
        mask=jnp.ones((B, 3), jnp.float32),
    )


def test_densenet121_3d_param_count_matches_torch_twin(batch):
    """Same architecture spec in torch (benchmarks/torch_reference.py) and
    flax must produce identical parameter counts."""
    import torch

    from benchmarks.torch_reference import _densenet121_3d

    tmodel = _densenet121_3d(128)
    t_params = sum(p.numel() for p in tmodel.parameters())
    img = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    model = DenseNet121_3D(out_features=128)
    # eval_shape: full abstract init, no FLOPs — the 121-layer 3D net is too
    # slow to actually initialize on the CPU test backend
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           img, train=False))
    # torch counts BN affine (weight+bias); running stats are buffers.
    f_params = param_count(variables["params"])
    assert f_params == t_params


def test_densenet_output_shape():
    img = jnp.zeros((B, 32, 32, 32, 1), jnp.float32)
    model = DenseNet121_3D(out_features=128)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           img, train=False))
    out = jax.eval_shape(
        lambda v: model.apply(v, img, train=False), variables)
    assert out.shape == (B, 128)


def test_densenet_rejects_undersized_input(batch):
    with pytest.raises(ValueError, match="spatial dims"):
        _init(DenseNet121_3D(out_features=8), batch["image"])


@pytest.mark.slow
def test_densenet_remat_matches(batch):
    import jax

    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 16, 16, 8, 1)), jnp.float32)
    grads = []
    for remat in (False, True):
        m = DenseNet121_3D(out_features=8, block_config=(2, 2),
                           init_features=8, growth_rate=4, remat=remat)
        v = _init(m, x)

        def loss(p):
            out, _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            return (out ** 2).sum()

        g = jax.grad(loss)(v["params"])
        grads.append(float(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))
    assert grads[0] == pytest.approx(grads[1], rel=1e-5)


def test_densenet_trunk_dus_matches_concat():
    """trunk='dus' (shared preallocated trunk, round-4 HBM lever) is the
    SAME function as the reference concat form: identical param tree (so
    checkpoints are interchangeable across modes), matching forward values,
    batch_stats, and gradients — including dropout (same rng consumption
    order) and training-mode BN."""
    import jax

    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 16, 16, 8, 1)), jnp.float32)
    outs, stats, grads, trees = [], [], [], []
    for trunk in ("concat", "dus"):
        m = DenseNet121_3D(out_features=8, block_config=(2, 3),
                           init_features=8, growth_rate=4, dropout=0.3,
                           trunk=trunk)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(0)}, x, train=False)
        trees.append(jax.tree_util.tree_structure(v["params"]))

        def loss(p):
            out, mut = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            return (out ** 2).sum(), mut["batch_stats"]

        (val, bs), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
        outs.append(float(val))
        stats.append(jax.tree_util.tree_leaves(bs))
        grads.append(jax.tree_util.tree_leaves(g))
    assert trees[0] == trees[1]  # checkpoint-interchangeable
    assert outs[0] == pytest.approx(outs[1], rel=1e-5)
    for a, b in zip(stats[0], stats[1]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    for a, b in zip(grads[0], grads[1]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("build", [
    lambda b: (RNASeqSurvivalModel(), (b["rnaseq"],), (B,)),
    lambda b: (ImageOnlyModel(), (b["image"],), (B,)),
    lambda b: (SimpleFusionModel(backbone="simple_cnn"),
               (b["image"], b["rnaseq"]), (B,)),
    lambda b: (FlexibleMultimodalModel(backbone="simple_cnn"),
               (b["image"], b["rnaseq"], b["mask"][:, :2]), (B,)),
    lambda b: (MultiModalSurvivalNet(backbone="simple_cnn"),
               (b["image"], b["rnaseq"], b["clinical"]), (B,)),
    lambda b: (MMsurvNet(backbone="simple_cnn"),
               (b["image"], b["rnaseq"], b["clinical"], b["mask"]), (B,)),
])
def test_single_output_models(batch, build):
    model, inputs, out_shape = build(batch)
    variables = _init(model, *inputs)
    out = model.apply(variables, *inputs, train=False)
    assert out.shape == out_shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_partial_modality_outputs_and_mask_zeroing(batch):
    model = PartialModalityNet(backbone="simple_cnn")
    inputs = (batch["image"], batch["rnaseq"], batch["clinical"],
              batch["mask"])
    variables = _init(model, *inputs)
    hazard, gates = model.apply(variables, *inputs, train=False)
    assert hazard.shape == (B,) and gates.shape == (B, 3)
    np.testing.assert_allclose(np.asarray(gates).sum(-1), 1.0, atol=1e-5)


def test_simmlm_masked_gate(batch):
    model = SimMLMSurvivalNet(backbone="simple_cnn")
    mask = jnp.asarray([[1, 1, 0], [0, 1, 1]], jnp.float32)
    inputs = (batch["image"], batch["rnaseq"], batch["clinical"], mask)
    variables = _init(model, *inputs)
    ens, experts, gates = model.apply(variables, *inputs, train=False)
    g = np.asarray(gates)
    # masked softmax: gate weight of missing modalities is exactly 0
    assert g[0, 2] == 0.0 and g[1, 0] == 0.0
    np.testing.assert_allclose(g.sum(-1), 1.0, atol=1e-5)
    assert experts.shape == (B, 3)


def test_simmlm_gate_all_missing_row_is_finite(batch):
    """A patient with NO modalities (mask [0,0,0] — plausible in the real
    cohort: labeled but no CT, no RNA, no age) must yield zero gates and a
    FINITE hazard: a softmax over an all-(-inf) row is NaN, and one NaN
    hazard poisons the whole batch's Cox cumlogsumexp."""
    model = SimMLMSurvivalNet(backbone="simple_cnn")
    mask = jnp.asarray([[0, 0, 0], [1, 1, 1]], jnp.float32)
    inputs = (batch["image"], batch["rnaseq"], batch["clinical"], mask)
    variables = _init(model, *inputs)
    ens, experts, gates = model.apply(variables, *inputs, train=False)
    g = np.asarray(gates)
    np.testing.assert_array_equal(g[0], 0.0)  # all-missing -> zero gates
    np.testing.assert_allclose(g[1].sum(), 1.0, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(ens)))
    assert np.all(np.isfinite(np.asarray(experts)))


def test_torch_linear_init_bounds():
    """TorchLinear init must match U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    from multimodal_survival_prediction_tpu.models.layers import TorchLinear

    m = TorchLinear(64)
    x = jnp.zeros((1, 400))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    k = np.asarray(params["dense"]["kernel"])
    bound = 1 / np.sqrt(400)
    assert k.min() >= -bound and k.max() <= bound
    assert abs(k.mean()) < bound / 10  # roughly centered


def test_checkpoint_roundtrip(tmp_path, batch):
    from multimodal_survival_prediction_tpu.io.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    model = RNASeqSurvivalModel(hidden_dims=(32,))
    variables = _init(model, batch["rnaseq"])
    save_checkpoint(tmp_path / "m.msgpack", jax.device_get(variables))
    zeroed = jax.tree_util.tree_map(np.zeros_like,
                                    jax.device_get(variables))
    restored = load_checkpoint(tmp_path / "m.msgpack", zeroed)
    a = model.apply(variables, batch["rnaseq"], train=False)
    b = model.apply(restored, batch["rnaseq"], train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_orbax(tmp_path, batch):
    from multimodal_survival_prediction_tpu.io.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    model = RNASeqSurvivalModel(hidden_dims=(16,))
    variables = jax.device_get(_init(model, batch["rnaseq"]))
    save_checkpoint_orbax(tmp_path / "ckpt", variables)
    zeroed = jax.tree_util.tree_map(np.zeros_like, variables)
    restored = load_checkpoint_orbax(tmp_path / "ckpt", zeroed)
    a = model.apply(variables, batch["rnaseq"], train=False)
    b = model.apply(restored, batch["rnaseq"], train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
