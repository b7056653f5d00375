"""Mesh construction for single-host TPU slices (v5e-8 over ICI)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def best_mesh_shape(n_devices: int, model_parallel: int = 1) -> tuple[int, int]:
    """(data, model) factorization of n_devices."""
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"{n_devices} devices not divisible by model={model_parallel}")
    return (n_devices // model_parallel, model_parallel)


def make_mesh(n_devices: int | None = None, model_parallel: int = 1,
              axis_names=("data", "model")) -> Mesh:
    """A (data, model) mesh over the first n_devices JAX devices.

    On a v5e-8 host this lays the data axis along the ICI ring; with
    model_parallel>1 the inner (fastest-varying) axis carries the
    tensor-parallel collectives, which keeps them on nearest-neighbor links.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    dp, mp = best_mesh_shape(n_devices, model_parallel)
    grid = np.asarray(devices[:n_devices]).reshape(dp, mp)
    return Mesh(grid, axis_names)
