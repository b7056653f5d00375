"""Kaplan-Meier / log-rank golden tests (hand-computed small examples)."""

import numpy as np
import pytest

from multimodal_survival_prediction_tpu.ops import (
    kaplan_meier,
    logrank_test,
    median_survival_time,
)


def test_km_textbook_example():
    # Classic: times 1,2+,3,4+,5 (+ = censored)
    time = [1, 2, 3, 4, 5]
    event = [1, 0, 1, 0, 1]
    km = kaplan_meier(time, event)
    # S(1)=4/5; S(3)=4/5*2/3=8/15; S(5)=8/15*0=0
    assert km.survival_at(1) == pytest.approx(0.8)
    assert km.survival_at(2) == pytest.approx(0.8)
    assert km.survival_at(3) == pytest.approx(8 / 15)
    assert km.survival_at(4.9) == pytest.approx(8 / 15)
    assert km.survival_at(5) == pytest.approx(0.0)
    assert km.survival_at(0) == 1.0


def test_km_all_censored():
    km = kaplan_meier([1, 2, 3], [0, 0, 0])
    assert km.survival_at(3) == 1.0
    assert km.median_survival_time == float("inf")


def test_median_survival():
    time = [1, 2, 3, 4]
    event = [1, 1, 1, 1]
    # S: 0.75, 0.5, 0.25, 0 -> first t with S<=0.5 is 2
    assert median_survival_time(time, event) == 2.0


def test_logrank_identical_groups_p1(rng):
    t = rng.uniform(1, 100, size=50)
    e = (rng.uniform(size=50) < 0.7).astype(int)
    res = logrank_test(t, e, t, e)
    assert res.p_value == pytest.approx(1.0)
    assert res.test_statistic == pytest.approx(0.0, abs=1e-12)


def test_logrank_separated_groups_small_p(rng):
    t_a = rng.uniform(1, 10, size=40)
    t_b = rng.uniform(100, 200, size=40)
    e = np.ones(40, int)
    res = logrank_test(t_a, e, t_b, e)
    assert res.p_value < 1e-6
    assert res.test_statistic > 30
