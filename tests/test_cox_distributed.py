"""Sharded risk-set scan vs the single-device Cox loss, on the 8-device
virtual mesh (gradients included)."""

import jax
import numpy as np
import pytest

from multimodal_survival_prediction_tpu.ops.cox import cox_partial_likelihood
from multimodal_survival_prediction_tpu.ops.cox_distributed import (
    cox_partial_likelihood_sharded,
)
from multimodal_survival_prediction_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis_names=("data", "model"))


def _sorted_inputs(rng, n):
    hazard = rng.normal(size=n).astype(np.float32)
    time = rng.uniform(1, 3000, size=n).astype(np.float32)
    event = (rng.uniform(size=n) < 0.6).astype(np.float32)
    event[0] = 1.0
    order = np.argsort(-time, kind="stable")
    return hazard[order], time[order], event[order]


@pytest.mark.parametrize("n", [64, 608])
def test_sharded_matches_single_device(mesh, n):
    rng = np.random.default_rng(1)
    h, t, e = _sorted_inputs(rng, -(-n // 8) * 8)  # pad to multiple of 8
    ref = float(cox_partial_likelihood(h, t, e))
    got = float(cox_partial_likelihood_sharded(h, t, e, mesh))
    assert got == pytest.approx(ref, abs=2e-5)


def test_sharded_with_padding(mesh):
    rng = np.random.default_rng(2)
    h, t, e = _sorted_inputs(rng, 40)
    pad = 24
    hp = np.concatenate([h, rng.normal(size=pad).astype(np.float32)])
    tp = np.concatenate([t, np.zeros(pad, np.float32)])
    ep = np.concatenate([e, np.ones(pad, np.float32)])
    vp = np.concatenate([np.ones(40, np.float32), np.zeros(pad, np.float32)])
    ref = float(cox_partial_likelihood(h, t, e))
    got = float(cox_partial_likelihood_sharded(hp, tp, ep, mesh, valid=vp))
    assert got == pytest.approx(ref, abs=2e-5)


def test_sharded_gradients_match(mesh):
    rng = np.random.default_rng(3)
    h, t, e = _sorted_inputs(rng, 64)
    g_ref = np.asarray(jax.grad(
        lambda x: cox_partial_likelihood(x, t, e))(h))
    g_shard = np.asarray(jax.grad(
        lambda x: cox_partial_likelihood_sharded(x, t, e, mesh))(h))
    np.testing.assert_allclose(g_shard, g_ref, atol=2e-5)


def test_unsorted_entry_matches_sorted(mesh):
    """presorted=False (the engine mode) must sort exactly like
    ops.cox._sort_desc_by_time — including pushing invalid rows last."""
    rng = np.random.default_rng(5)
    n, pad = 48, 16
    hazard = rng.normal(size=n + pad).astype(np.float32)
    time = rng.uniform(1, 3000, size=n + pad).astype(np.float32)
    event = (rng.uniform(size=n + pad) < 0.6).astype(np.float32)
    event[0] = 1.0
    valid = np.concatenate(
        [np.ones(n, np.float32), np.zeros(pad, np.float32)])
    ref = float(cox_partial_likelihood(hazard, time, event, valid=valid))
    got = float(cox_partial_likelihood_sharded(
        hazard, time, event, mesh, valid=valid, presorted=False))
    assert got == pytest.approx(ref, abs=2e-5)


@pytest.mark.slow
def test_engine_sharded_risk_set_matches_default(mesh):
    """Trainer(sharded_risk_set=True) — the opt-in engine mode — must produce
    the same one-epoch trajectory as the default hazard-all-gather path on a
    batch-DP mesh (same init/shuffle/dropout chain; Breslow semantics are
    identical, only the collective structure differs)."""
    from multimodal_survival_prediction_tpu.models import RNASeqSurvivalModel
    from multimodal_survival_prediction_tpu.train.engine import (
        TrainConfig,
        Trainer,
    )

    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    n, d = 64, 48
    data = {
        "rnaseq": rng.normal(size=(n, d)).astype(np.float32),
        "time": rng.uniform(1, 3000, size=n).astype(np.float32),
        "event": (rng.uniform(size=n) < 0.6).astype(np.float32),
        "svalid": np.ones(n, np.float32),
    }
    data["event"][:4] = 1.0
    cfg = TrainConfig(batch_size=16)
    model = RNASeqSurvivalModel(hidden_dims=(32, 16))

    def one_epoch(sharded: bool):
        tr = Trainer(model, lambda b: (b["rnaseq"],), None, cfg, mesh=mesh,
                     sharded_risk_set=sharded)
        example = {k: v[:16] for k, v in data.items()}
        example["valid"] = example["svalid"]
        state = tr.init_state(example, fold=1)
        dev = {k: jnp.asarray(v) for k, v in data.items()}
        state, loss = tr.train_epoch(
            state, dev, np.arange(n), np.random.default_rng(9), 1e-3,
            jax.random.PRNGKey(4))
        c, vloss, _ = tr.evaluate(state, dev, np.arange(n))
        return loss, c, vloss

    l_ref, c_ref, v_ref = one_epoch(False)
    l_sh, c_sh, v_sh = one_epoch(True)
    assert l_sh == pytest.approx(l_ref, abs=2e-5)
    assert v_sh == pytest.approx(v_ref, abs=2e-5)
    assert c_sh == pytest.approx(c_ref, abs=1e-6)


def _tied_inputs(rng, n, n_times=5):
    """Heavily tied survival data: times drawn from a small integer set so
    tie groups straddle the 8 shard boundaries."""
    hazard = rng.normal(size=n).astype(np.float32)
    time = rng.integers(1, 1 + n_times, size=n).astype(np.float32)
    event = (rng.uniform(size=n) < 0.6).astype(np.float32)
    event[0] = 1.0
    order = np.argsort(-time, kind="stable")
    return hazard[order], time[order], event[order]


@pytest.mark.parametrize("n_times", [1, 3, 5])
def test_sharded_efron_matches_single_device(mesh, n_times):
    """Cross-shard tie groups (n_times=1 is ONE group spanning all 8
    shards) must reproduce the single-axis Efron loss."""
    rng = np.random.default_rng(7)
    h, t, e = _tied_inputs(rng, 64, n_times)
    ref = float(cox_partial_likelihood(h, t, e, ties="efron"))
    got = float(cox_partial_likelihood_sharded(h, t, e, mesh, ties="efron"))
    assert got == pytest.approx(ref, abs=2e-5)


def test_sharded_efron_untied_equals_breslow(mesh):
    rng = np.random.default_rng(8)
    h, t, e = _sorted_inputs(rng, 64)  # continuous times: no ties
    br = float(cox_partial_likelihood_sharded(h, t, e, mesh))
    ef = float(cox_partial_likelihood_sharded(h, t, e, mesh, ties="efron"))
    assert ef == pytest.approx(br, abs=2e-5)


def test_sharded_efron_gradients_match(mesh):
    rng = np.random.default_rng(9)
    h, t, e = _tied_inputs(rng, 64, 4)
    g_ref = np.asarray(jax.grad(
        lambda x: cox_partial_likelihood(x, t, e, ties="efron"))(h))
    g_shard = np.asarray(jax.grad(
        lambda x: cox_partial_likelihood_sharded(
            x, t, e, mesh, ties="efron"))(h))
    np.testing.assert_allclose(g_shard, g_ref, atol=2e-5)


def test_sharded_efron_unsorted_with_padding(mesh):
    """presorted=False + validity mask (the engine path) under heavy ties."""
    rng = np.random.default_rng(10)
    n, pad = 48, 16
    hazard = rng.normal(size=n + pad).astype(np.float32)
    time = rng.integers(1, 5, size=n + pad).astype(np.float32)
    event = (rng.uniform(size=n + pad) < 0.6).astype(np.float32)
    event[0] = 1.0
    valid = np.concatenate(
        [np.ones(n, np.float32), np.zeros(pad, np.float32)])
    ref = float(cox_partial_likelihood(
        hazard, time, event, valid=valid, ties="efron"))
    got = float(cox_partial_likelihood_sharded(
        hazard, time, event, mesh, valid=valid, presorted=False,
        ties="efron"))
    assert got == pytest.approx(ref, abs=2e-5)


def test_sharded_efron_presorted_invalid_interleaved(mesh):
    """presorted=True with invalid rows INTERLEAVED at their raw times (legal
    under the documented 'globally sorted by time descending' contract) must
    not split tie groups: invalid rows inherit the nearest preceding valid
    time, so the loss matches the single-axis Efron on the valid subset."""
    rng = np.random.default_rng(11)
    n = 64
    hazard = rng.normal(size=n).astype(np.float32)
    time = rng.integers(1, 4, size=n).astype(np.float32)  # heavy ties
    event = (rng.uniform(size=n) < 0.6).astype(np.float32)
    event[:2] = 1.0
    valid = (rng.uniform(size=n) < 0.75).astype(np.float32)
    valid[:2] = 1.0
    order = np.argsort(-time, kind="stable")  # raw-time sort: invalids
    h, t, e, v = (x[order] for x in (hazard, time, event, valid))  # interleave
    ref = float(cox_partial_likelihood(h, t, e, valid=v, ties="efron"))
    got = float(cox_partial_likelihood_sharded(
        h, t, e, mesh, valid=v, presorted=True, ties="efron"))
    assert got == pytest.approx(ref, abs=2e-5)


def test_engine_sharded_risk_set_efron_matches_default(mesh):
    """Trainer(sharded_risk_set=True) with cfg.ties='efron' must match the
    default all-gather Efron path on a tied cohort."""
    from multimodal_survival_prediction_tpu.models import RNASeqSurvivalModel
    from multimodal_survival_prediction_tpu.train.engine import (
        TrainConfig,
        Trainer,
    )

    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n, d = 64, 32
    data = {
        "rnaseq": rng.normal(size=(n, d)).astype(np.float32),
        "time": rng.integers(1, 6, size=n).astype(np.float32),
        "event": (rng.uniform(size=n) < 0.6).astype(np.float32),
        "svalid": np.ones(n, np.float32),
    }
    data["event"][:4] = 1.0
    cfg = TrainConfig(batch_size=16, ties="efron")
    model = RNASeqSurvivalModel(hidden_dims=(16,))

    def one_epoch(sharded: bool):
        tr = Trainer(model, lambda b: (b["rnaseq"],), None, cfg, mesh=mesh,
                     sharded_risk_set=sharded)
        example = {k: v[:16] for k, v in data.items()}
        example["valid"] = example["svalid"]
        state = tr.init_state(example, fold=1)
        dev = {k: jnp.asarray(v) for k, v in data.items()}
        state, loss = tr.train_epoch(
            state, dev, np.arange(n), np.random.default_rng(9), 1e-3,
            jax.random.PRNGKey(4))
        return loss

    assert one_epoch(True) == pytest.approx(one_epoch(False), abs=2e-5)


def test_sharded_degenerate_all_censored(mesh):
    rng = np.random.default_rng(4)
    h = rng.normal(size=16).astype(np.float32)
    t = np.sort(rng.uniform(1, 10, size=16).astype(np.float32))[::-1].copy()
    assert float(cox_partial_likelihood_sharded(
        h, t, np.zeros(16, np.float32), mesh)) == 0.0
