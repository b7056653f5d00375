"""Utils subsystem tests: throughput meter, finite checks, schedules."""

import math

import numpy as np
import pytest

from multimodal_survival_prediction_tpu.train.schedules import (
    ReduceLROnPlateau,
    cosine_annealing,
)
from multimodal_survival_prediction_tpu.utils import (
    ThroughputMeter,
    check_finite,
    param_count,
)


def test_throughput_meter():
    m = ThroughputMeter("t")
    for _ in range(5):
        m.update(n_items=8)
    s = m.summary()
    assert s["steps"] == 5 and s["items"] == 40
    assert s["steps_per_sec"] > 0


def test_check_finite_raises():
    check_finite({"a": np.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="bad"):
        check_finite({"x": {"y": np.array([1.0, np.nan])}}, "bad")


def test_param_count():
    tree = {"w": np.zeros((3, 4)), "b": np.zeros(4)}
    assert param_count(tree) == 16


def test_cosine_matches_torch_formula():
    import torch

    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.SGD(lin.parameters(), lr=0.1)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=50)
    for epoch in range(10):
        expected = opt.param_groups[0]["lr"]
        ours = cosine_annealing(0.1, epoch, 50)
        assert ours == pytest.approx(expected, rel=1e-6)
        opt.step()
        sched.step()


def test_plateau_matches_torch():
    import torch

    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.SGD(lin.parameters(), lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=5)
    ours = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=5)
    metrics = [0.5, 0.6, 0.59, 0.58, 0.58, 0.58, 0.58, 0.58, 0.61, 0.60,
               0.60, 0.60, 0.60, 0.60, 0.60, 0.60, 0.55]
    for m in metrics:
        sched.step(m)
        lr_ours = ours.step(m)
        assert lr_ours == pytest.approx(opt.param_groups[0]["lr"])


def test_profile_trace_writes_artifacts(tmp_path):
    import jax
    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.utils import profile_trace

    with profile_trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    # xplane protobuf dump appears under plugins/profile/<run>/
    hits = list(tmp_path.rglob("*.xplane.pb"))
    assert hits, f"no trace artifacts in {tmp_path}"


def test_block_and_time():
    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.utils import block_and_time

    secs, out = block_and_time(lambda: jnp.arange(8) * 2, iters=2)
    assert secs >= 0
    assert int(out[-1]) == 14
