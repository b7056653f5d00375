"""Guard the driver entry points: entry() compiles, dryrun_multichip runs on
the virtual 8-device CPU mesh with DP x TP shardings."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally (loss finite, TP sharding)


def test_entry_jits_in_eval_shape():
    """Full compile of the DenseNet fwd is too slow for CPU CI; eval_shape
    proves the traced program is well-formed with the exact example args."""
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    hazard, gates = out
    assert hazard.shape == (8,)
    assert gates.shape == (8, 3)
