"""C-index tests: vectorized implementation vs. explicit double loops."""

import numpy as np
import pytest

from multimodal_survival_prediction_tpu.ops import concordance_index


def loop_cindex_naive(hazard, time, event):
    """Reference hand-rolled variant (reference train_rnaseq_only.py:55-70):
    strictly `hazard[i] > hazard[j]` — tied predictions get 0 credit."""
    concordant, total = 0.0, 0
    n = len(time)
    for i in range(n):
        if event[i] != 1:
            continue
        for j in range(n):
            if time[j] > time[i]:
                total += 1
                if hazard[i] > hazard[j]:
                    concordant += 1
    return concordant / total if total > 0 else 0.5


def loop_cindex_harrell(hazard, time, event):
    num, den = 0.0, 0.0
    n = len(time)
    for i in range(n):
        for j in range(n):
            comparable = (time[i] < time[j] and event[i] == 1) or (
                time[i] == time[j] and event[i] == 1 and event[j] == 0
            )
            if not comparable:
                continue
            den += 1
            if hazard[i] > hazard[j]:
                num += 1
            elif hazard[i] == hazard[j]:
                num += 0.5
    return num / den if den > 0 else 0.5


@pytest.mark.parametrize("n", [4, 33, 100])
def test_matches_double_loops(rng, n):
    hazard = rng.normal(size=n).astype(np.float32)
    time = rng.integers(1, 40, size=n).astype(np.float32)  # force ties
    event = (rng.uniform(size=n) < 0.6).astype(np.float32)
    assert float(
        concordance_index(hazard, time, event, variant="naive")
    ) == pytest.approx(loop_cindex_naive(hazard, time, event), abs=1e-6)
    assert float(
        concordance_index(hazard, time, event, variant="harrell")
    ) == pytest.approx(loop_cindex_harrell(hazard, time, event), abs=1e-6)


def test_perfect_and_anti_concordance():
    time = np.array([1.0, 2.0, 3.0, 4.0])
    event = np.ones(4)
    # higher hazard for earlier events = perfect
    assert float(concordance_index([4, 3, 2, 1], time, event)) == 1.0
    assert float(concordance_index([1, 2, 3, 4], time, event)) == 0.0
    assert float(concordance_index([1, 1, 1, 1], time, event)) == 0.5


def test_no_comparable_pairs_returns_half():
    # all censored
    assert (
        float(concordance_index([1.0, 2.0], [5.0, 6.0], [0.0, 0.0])) == 0.5
    )


def test_valid_mask(rng):
    n, pad = 20, 12
    hazard = rng.normal(size=n)
    time = rng.uniform(1, 100, size=n)
    event = (rng.uniform(size=n) < 0.5).astype(np.float32)
    event[0] = 1
    base = float(concordance_index(hazard, time, event))
    hp = np.concatenate([hazard, rng.normal(size=pad)])
    tp = np.concatenate([time, rng.uniform(1, 100, size=pad)])
    ep = np.concatenate([event, np.ones(pad)])
    vp = np.concatenate([np.ones(n), np.zeros(pad)])
    assert float(concordance_index(hp, tp, ep, valid=vp)) == pytest.approx(
        base, abs=1e-6
    )


def test_naive_tie_credit_is_zero():
    """Tied predictions: naive (reference double loop) gives 0 credit,
    Harrell gives 0.5 — the ADVICE r1 divergence, now pinned both ways."""
    hazard = np.array([1.0, 1.0, 2.0, 0.0], np.float32)
    time = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    event = np.ones(4, np.float32)
    naive = float(concordance_index(hazard, time, event, variant="naive"))
    harrell = float(concordance_index(hazard, time, event, variant="harrell"))
    assert naive == pytest.approx(loop_cindex_naive(hazard, time, event))
    assert harrell == pytest.approx(loop_cindex_harrell(hazard, time, event))
    assert naive != harrell  # pair (0,1) is tied: 0 vs 0.5 credit
    assert naive == pytest.approx(3.0 / 6.0)
    assert harrell == pytest.approx(3.5 / 6.0)
