"""Pinned numeric regression values for the core survival ops.

These literals were produced by the current (golden-tested) implementations;
they exist to catch silent numeric drift in future rounds (a changed sort
order, a dtype regression, an accidental eps change) that the behavioral
tests might absorb. Tolerances are loose enough for cross-backend fp32
variation but tight enough to catch semantic changes.
"""

import numpy as np
import pytest

from multimodal_survival_prediction_tpu.ops import (
    concordance_index,
    cox_partial_likelihood,
    kaplan_meier,
)

HAZARD = np.array([0.5, -1.2, 0.3, 2.0, -0.7, 0.0, 1.1, -0.4], np.float32)
TIME = np.array([100., 50., 300., 20., 500., 250., 80., 400.], np.float32)
EVENT = np.array([1., 0., 1., 1., 0., 1., 1., 0.], np.float32)


def test_cox_pinned_value():
    # independently recomputable: sort desc by time, logcumsumexp, mean over
    # events (Breslow)
    assert float(cox_partial_likelihood(HAZARD, TIME, EVENT)) == \
        pytest.approx(0.9573469, abs=1e-4)


def test_cindex_pinned_value():
    assert float(concordance_index(HAZARD, TIME, EVENT)) == \
        pytest.approx(0.9523810, abs=1e-6)


def test_km_pinned_values():
    km = kaplan_meier(TIME, EVENT)
    assert km.survival_at(100) == pytest.approx(0.5833333, abs=1e-6)
    assert km.survival_at(300) == pytest.approx(0.2916667, abs=1e-6)
    assert km.median_survival_time == pytest.approx(250.0)
