"""Device-mesh parallelism: mesh construction, sharding rules, DP/TP layout.

The reference has NO distributed execution at all (SURVEY §2.9 — single CUDA
device, num_workers=0). This subsystem is the TPU-native capability added on
top: batch data-parallelism + tensor-parallel wide layers over a
`jax.sharding.Mesh` (v5e-8 ICI), with XLA inserting the collectives (the
(B,) hazard all-gather the global Cox risk set needs is tiny).
"""

from .mesh import make_mesh, best_mesh_shape  # noqa: F401
from .multihost import (  # noqa: F401
    barrier,
    initialize_distributed,
    is_coordinator,
    make_global_mesh,
    read_back,
)
from .sharding import (  # noqa: F401
    param_shardings,
    replicate,
    shard_batch_dim,
)
