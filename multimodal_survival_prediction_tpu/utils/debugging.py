"""Debug utilities: NaN/Inf guards, parameter accounting.

Stands in for the sanitizer/race-detection row of SURVEY §5: JAX SPMD has no
data races to detect (pure functional steps, XLA-managed buffers); the
failure modes that matter here are non-finite values and silent donation
bugs, which these helpers surface."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(tree, name: str = "tree") -> None:
    """Raise with the offending path if any leaf has NaN/Inf (host-side;
    use inside training loops between epochs, not inside jit)."""
    bad = []

    def visit(path, leaf):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            bad.append(jax.tree_util.keystr(path))
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:5]}")


def nan_guard(x, label: str = ""):
    """In-jit NaN check via jax.debug (no-op on clean values)."""
    def _cb(v):
        if not np.all(np.isfinite(v)):
            raise FloatingPointError(f"non-finite value at {label}")

    jax.debug.callback(_cb, jnp.asarray(x))
    return x


def param_count(params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params)
               if hasattr(p, "shape"))
