"""Multi-host (multi-process) execution: ``jax.distributed`` bring-up,
ICI×DCN-aware global meshes, and coordinator-guarded host I/O.

The reference has no distributed story at all (SURVEY §2.9 — one CUDA
device, ``num_workers=0``); single-host DP/TP over a `jax.sharding.Mesh`
is this framework's own addition (`parallel/mesh.py`).  This module extends
that to TPU **pods**: several hosts, each owning a subset of the chips,
running the same SPMD program under the JAX runtime's coordination service.

Design (the scaling-book recipe, multi-host edition):

* every process calls :func:`initialize_distributed` once before first
  device use — on Cloud TPU pods with no arguments (the cluster is
  auto-detected from the metadata server); elsewhere with an explicit
  coordinator address + process id;
* :func:`make_global_mesh` builds ONE mesh over the *global* device list.
  On a multi-slice pod the mesh is hybrid (`create_hybrid_device_mesh`):
  the model/tensor-parallel axis and per-slice data-parallel stay inside a
  slice (ICI), while the outer data-parallel axis spans slices over DCN —
  gradient all-reduces are the only cross-slice collectives, which is the
  layout DCN bandwidth wants;
* the training engine needs **no changes**: `jax.device_put` of an
  identical host array onto a global `NamedSharding` is legal from every
  process (verified by `tests/test_multihost.py`'s real 2-process CPU
  cluster), replicated outputs (losses, C-indices, params) are readable
  from every process, and GSPMD inserts the cross-host collectives;
* host-side artifact writes (checkpoints, cv_results.json, resume state)
  happen on the coordinator only — :func:`is_coordinator` — so a shared
  filesystem sees exactly one writer.

Each process must construct the *same* host-side inputs (cohort arrays,
fold splits, RNG seeds).  Every cohort builder in this framework is
deterministic given the same files/seed, so running the identical CLI
command on every host satisfies this.

``--resume`` under multi-host additionally requires the resume directory
to live on a SHARED filesystem: the coordinator writes the periodic
state/progress files and every process resume-reads them at fold start
(the post-save barrier orders writer before readers).
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import best_mesh_shape, make_mesh

log = logging.getLogger(__name__)


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> tuple[int, int]:
    """Join (or create) the JAX coordination service; idempotent.

    On Cloud TPU pod slices call with no arguments — the runtime discovers
    the coordinator and process layout itself.  For manual clusters (or the
    CPU-cluster tests) pass ``coordinator="host:port"``, ``num_processes``
    and ``process_id`` explicitly.

    Returns ``(process_index, process_count)`` after initialization.
    """
    if jax.distributed.is_initialized():
        return jax.process_index(), jax.process_count()
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    pi, pc = jax.process_index(), jax.process_count()
    log.info("jax.distributed initialized: process %d/%d, %d local / %d "
             "global devices", pi, pc, len(jax.local_devices()),
             len(jax.devices()))
    return pi, pc


def is_coordinator() -> bool:
    """True on the process that should write shared artifacts.

    Single-process runs are their own coordinator, so callers can guard
    writes unconditionally.
    """
    return jax.process_index() == 0


def barrier(tag: str = "barrier") -> None:
    """Block until every process reaches this point (no-op single-process).

    Use around coordinator-only filesystem writes that other processes
    subsequently read (e.g. resume state).
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def make_global_mesh(model_parallel: int = 1,
                     axis_names=("data", "model")) -> Mesh:
    """A (data, model) mesh over ALL global devices, topology-aware.

    * single process → delegates to :func:`parallel.mesh.make_mesh`
      (contiguous ICI layout);
    * multi-process, single slice → `mesh_utils.create_device_mesh` over
      the global device list (physical-topology-aware on TPU; plain
      row-major elsewhere);
    * multi-slice pod (devices report distinct ``slice_index``) → hybrid
      ICI×DCN mesh: the data axis factorizes as
      (slices × per-slice-data) with model-parallel innermost, so TP
      collectives and per-slice DP ride ICI and only the gradient
      all-reduce crosses DCN.
    """
    devices = jax.devices()
    n = len(devices)
    dp, mp = best_mesh_shape(n, model_parallel)

    if jax.process_count() == 1:
        return make_mesh(n, model_parallel, axis_names)

    slice_ids = sorted({getattr(d, "slice_index", 0) or 0 for d in devices})
    n_slices = len(slice_ids)
    from jax.experimental import mesh_utils

    if n_slices > 1 and n % n_slices == 0:
        per_slice = n // n_slices
        if per_slice % mp != 0:
            raise ValueError(
                f"model_parallel={mp} does not fit inside one slice of "
                f"{per_slice} devices; TP must not span DCN")
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_slice // mp, mp),
            dcn_mesh_shape=(n_slices, 1),
            devices=devices,
        )
        # hybrid mesh comes back as (slices*dp_per_slice, mp)
        grid = np.asarray(grid).reshape(dp, mp)
    else:
        grid = mesh_utils.create_device_mesh((dp, mp), devices=devices)
    return Mesh(grid, axis_names)


def fetch_tree(tree):
    """``jax.device_get`` that tolerates leaves sharded across processes
    (e.g. tensor-parallel kernels under a multi-host mesh): every leaf goes
    through :func:`read_back`, so cross-process-sharded leaves are
    allgathered to their full global value while addressable/replicated
    leaves convert directly."""
    return jax.tree_util.tree_map(read_back, tree)


def read_back(x) -> np.ndarray:
    """Fetch a jax.Array to host numpy from any process.

    Replicated or fully-addressable arrays convert directly; an array
    sharded across processes is materialized with
    ``multihost_utils.process_allgather(tiled=True)`` (each process
    contributes its shards, every process receives the full value).
    """
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_addressable or x.is_fully_replicated:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
