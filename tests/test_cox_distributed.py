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


def test_sharded_degenerate_all_censored(mesh):
    rng = np.random.default_rng(4)
    h = rng.normal(size=16).astype(np.float32)
    t = np.sort(rng.uniform(1, 10, size=16).astype(np.float32))[::-1].copy()
    assert float(cox_partial_likelihood_sharded(
        h, t, np.zeros(16, np.float32), mesh)) == 0.0
