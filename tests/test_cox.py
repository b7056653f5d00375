"""Cox partial-likelihood golden tests vs. a torch reference implementation.

The golden is the reference's stable fallback semantics (sort desc by time ->
logcumsumexp -> event-masked mean; reference final_multimodal.py:171-186),
re-expressed here in torch purely as test oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodal_survival_prediction_tpu.ops import (
    cox_partial_likelihood,
    gate_entropy_loss,
)


def torch_cox_loss(hazard, event, time):
    hazard = torch.as_tensor(hazard, dtype=torch.float32)
    event = torch.as_tensor(event, dtype=torch.float32)
    time = torch.as_tensor(time, dtype=torch.float32)
    if hazard.shape[0] < 2 or event.sum() == 0:
        return torch.tensor(0.0)
    order = torch.argsort(time, descending=True, stable=True)
    hazard, event = hazard[order], event[order]
    log_cumsum = torch.logcumsumexp(hazard, dim=0)
    return -torch.sum((hazard - log_cumsum) * event) / (event.sum() + 1e-8)


@pytest.mark.parametrize("n", [2, 5, 16, 127])
def test_cox_matches_torch_reference(rng, n):
    hazard = rng.normal(size=n).astype(np.float32)
    time = rng.uniform(1, 3000, size=n).astype(np.float32)
    event = (rng.uniform(size=n) < 0.6).astype(np.float32)
    if event.sum() == 0:
        event[0] = 1.0
    ours = float(cox_partial_likelihood(hazard, time, event))
    golden = float(torch_cox_loss(hazard, event, time))
    assert ours == pytest.approx(golden, abs=1e-4)


def test_cox_degenerate_batches(rng):
    # 0 events -> 0
    h = rng.normal(size=8).astype(np.float32)
    t = rng.uniform(1, 100, size=8).astype(np.float32)
    assert float(cox_partial_likelihood(h, t, np.zeros(8, np.float32))) == 0.0
    # <2 valid samples -> 0
    e = np.ones(8, np.float32)
    v = np.zeros(8, np.float32)
    v[0] = 1.0
    assert float(cox_partial_likelihood(h, t, e, valid=v)) == 0.0


def test_cox_padding_invariance(rng):
    """Padded invalid entries must not change the loss."""
    n, pad = 11, 21
    hazard = rng.normal(size=n).astype(np.float32)
    time = rng.uniform(1, 3000, size=n).astype(np.float32)
    event = (rng.uniform(size=n) < 0.7).astype(np.float32)
    event[0] = 1.0
    base = float(cox_partial_likelihood(hazard, time, event))

    hp = np.concatenate([hazard, rng.normal(size=pad)]).astype(np.float32)
    tp = np.concatenate([time, rng.uniform(1, 3000, size=pad)]).astype(np.float32)
    ep = np.concatenate([event, np.ones(pad)]).astype(np.float32)
    vp = np.concatenate([np.ones(n), np.zeros(pad)]).astype(np.float32)
    padded = float(cox_partial_likelihood(hp, tp, ep, valid=vp))
    assert padded == pytest.approx(base, abs=1e-4)


def test_cox_gradients_match_torch(rng):
    import jax

    n = 32
    hazard = rng.normal(size=n).astype(np.float32)
    time = rng.uniform(1, 3000, size=n).astype(np.float32)
    event = (rng.uniform(size=n) < 0.5).astype(np.float32)
    event[:2] = 1.0

    g_ours = np.asarray(
        jax.grad(lambda h: cox_partial_likelihood(h, time, event))(hazard)
    )

    h_t = torch.tensor(hazard, requires_grad=True)
    torch_cox_loss(h_t, event, time).backward()
    g_torch = h_t.grad.numpy()
    np.testing.assert_allclose(g_ours, g_torch, atol=1e-5)


def test_cox_efron_reduces_to_breslow_when_no_ties(rng):
    n = 24
    hazard = rng.normal(size=n).astype(np.float32)
    time = np.arange(1, n + 1).astype(np.float32)
    rng.shuffle(time)
    event = (rng.uniform(size=n) < 0.5).astype(np.float32)
    event[0] = 1.0
    a = float(cox_partial_likelihood(hazard, time, event, ties="breslow"))
    b = float(cox_partial_likelihood(hazard, time, event, ties="efron"))
    assert a == pytest.approx(b, abs=1e-4)


def test_gate_entropy_matches_torch(rng):
    g = rng.uniform(size=(16, 3)).astype(np.float32)
    g = g / g.sum(-1, keepdims=True)
    ours = float(gate_entropy_loss(g))
    gt = torch.as_tensor(g)
    ent = -torch.sum(gt * torch.log(gt + 1e-8), dim=1)
    golden = float(-ent.mean())
    assert ours == pytest.approx(golden, abs=1e-5)


def test_efron_matches_naive_reference(rng):
    """Efron correction vs an independent direct-summation implementation."""
    n = 30
    hazard = rng.normal(size=n).astype(np.float64)
    time = rng.integers(1, 8, size=n).astype(np.float64)  # heavy ties
    event = (rng.uniform(size=n) < 0.7).astype(np.float64)
    event[:2] = 1.0

    # direct Efron NLL: for each unique event time t with D events,
    # sum_{k=0..d-1} log( sum_{risk} e^h - (k/d) sum_{tied events} e^h )
    # minus sum of tied-event hazards; risk set = {time >= t}
    neg_ll = 0.0
    n_events = event.sum()
    for t in np.unique(time[event > 0]):
        tied = (time == t) & (event > 0)
        d = int(tied.sum())
        risk = np.exp(hazard[time >= t]).sum()
        tie_sum = np.exp(hazard[tied]).sum()
        neg_ll -= hazard[tied].sum()
        for k in range(d):
            neg_ll += np.log(risk - (k / d) * tie_sum)
    golden_val = neg_ll / n_events

    ours = float(cox_partial_likelihood(
        hazard.astype(np.float32), time.astype(np.float32),
        event.astype(np.float32), ties="efron"))
    assert ours == pytest.approx(golden_val, abs=2e-3)


def _torch_efron_nll(h, time_t, event_t):
    """Independent torch Efron NLL (direct summation, autograd-able)."""
    neg = 0.0
    for t in torch.unique(time_t[event_t > 0]):
        tied = (time_t == t) & (event_t > 0)
        d = int(tied.sum())
        risk = torch.exp(h[time_t >= t]).sum()
        tie = torch.exp(h[tied]).sum()
        neg = neg - h[tied].sum()
        for k in range(d):
            neg = neg + torch.log(risk - (k / d) * tie)
    return neg / event_t.sum()


def test_efron_gradient_matches_torch_oracle_under_ties(rng):
    """Gradient of the Efron path vs torch autograd on an independent
    direct-summation oracle, on a tied-heavy dataset (VERDICT r1 weak #8)."""
    n = 28
    hazard = rng.normal(size=n).astype(np.float32)
    time = rng.integers(1, 6, size=n).astype(np.float32)  # heavy ties
    event = (rng.uniform(size=n) < 0.7).astype(np.float32)
    event[:3] = 1.0

    g_ours = np.asarray(jax.grad(
        lambda h: cox_partial_likelihood(h, time, event, ties="efron")
    )(jnp.asarray(hazard)))

    h_t = torch.as_tensor(hazard, dtype=torch.float64).requires_grad_()
    _torch_efron_nll(h_t, torch.as_tensor(time, dtype=torch.float64),
                     torch.as_tensor(event, dtype=torch.float64)).backward()
    g_torch = h_t.grad.numpy()
    np.testing.assert_allclose(g_ours, g_torch, atol=2e-4)


def test_efron_gradient_zero_for_invalid_rows(rng):
    """Padding/unlabeled rows must get exactly zero gradient under Efron,
    and the valid-subset gradient must equal the unpadded computation."""
    n = 20
    hazard = rng.normal(size=n).astype(np.float32)
    time = rng.integers(1, 5, size=n).astype(np.float32)
    event = (rng.uniform(size=n) < 0.7).astype(np.float32)
    event[:2] = 1.0
    valid = np.ones(n, np.float32)
    valid[-6:] = 0.0

    g_masked = np.asarray(jax.grad(
        lambda h: cox_partial_likelihood(h, time, event, valid=valid,
                                         ties="efron"))(jnp.asarray(hazard)))
    assert np.all(g_masked[-6:] == 0.0)

    g_sub = np.asarray(jax.grad(
        lambda h: cox_partial_likelihood(h, time[:-6], event[:-6],
                                         ties="efron"))
        (jnp.asarray(hazard[:-6])))
    np.testing.assert_allclose(g_masked[:-6], g_sub, atol=1e-6)


def test_efron_loss_matches_torch_oracle_many_seeds():
    """Value check across several tied configurations (incl. all-tied)."""
    for seed in range(4):
        r = np.random.default_rng(seed)
        n = 16
        hazard = r.normal(size=n).astype(np.float32)
        hi = 2 if seed == 3 else 5  # seed 3: every sample at time 1 (all tied)
        time = r.integers(1, hi, size=n).astype(np.float32)
        event = (r.uniform(size=n) < 0.8).astype(np.float32)
        event[0] = 1.0
        ours = float(cox_partial_likelihood(hazard, time, event,
                                            ties="efron"))
        golden = float(_torch_efron_nll(
            torch.as_tensor(hazard, dtype=torch.float64),
            torch.as_tensor(time, dtype=torch.float64),
            torch.as_tensor(event, dtype=torch.float64)))
        assert ours == pytest.approx(golden, abs=2e-4), seed
