"""Distributed Cox partial likelihood: the risk-set scan sharded over a mesh.

At reference scale the risk set is <=608 samples and the (B,) hazard
all-gather is free (SURVEY §2.9). This module is the scaling path the survey
flags (§5 long-context row): when the time-sorted batch axis is sharded over
devices (whole-biobank risk sets), the Cox log-cumsum-exp is a distributed
prefix scan:

  1. each shard computes its LOCAL logcumsumexp (cumulative over its rows),
  2. shard totals (one scalar per shard) are all-gathered — the only
     communication, O(n_devices) scalars,
  3. each shard folds in the exclusive prefix of preceding shard totals via
     one logaddexp — an associative combine, exactly a Blelloch scan with
     logsumexp as the operator.

The loss reduction is then a psum of shard-local partial sums. Implemented
with shard_map so the collective structure is explicit and testable on the
virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1.0e30


def _local_logcumsumexp_with_offset(h_local, axis_name):
    """Per-shard logcumsumexp + fold-in of preceding shards' totals."""
    local = jax.lax.cumlogsumexp(h_local, axis=0)
    total = local[-1]
    totals = jax.lax.all_gather(total, axis_name)  # (n_shards,)
    idx = jax.lax.axis_index(axis_name)
    # exclusive logsumexp-prefix of earlier shard totals
    n = totals.shape[0]
    mask = jnp.arange(n) < idx
    prev = jnp.where(mask, totals, _NEG)
    offset = jax.nn.logsumexp(prev)
    return jnp.logaddexp(local, offset)


def cox_partial_likelihood_sharded(
    hazard, time, event, mesh: Mesh, axis_name: str = "data",
    valid=None, eps: float = 1e-8, presorted: bool = True,
):
    """Cox NLL with the batch axis sharded over `axis_name`.

    With ``presorted=True`` (default) inputs must be GLOBALLY sorted by time
    descending BEFORE sharding (the caller owns the distributed sort; for
    cohort-scale data this is a host argsort, for truly huge data a device
    sample-sort). ``presorted=False`` sorts on device first — the mode the
    training engine uses (`Trainer(sharded_risk_set=True)`): batches arrive
    in shuffle order, the argsort+gather is O(B) device work and XLA owns the
    resulting resharding. Semantics match
    ops.cox.cox_partial_likelihood(ties='breslow') including the
    degenerate-batch guards; the distributed scan is **Breslow-only** — the
    Efron correction needs tie-group structure across shard boundaries
    (use the single-axis ops.cox path for ``ties='efron'``).
    """
    hazard = jnp.asarray(hazard, jnp.float32)
    time = jnp.asarray(time, jnp.float32)
    event = jnp.asarray(event, jnp.float32)
    valid = (jnp.ones_like(event) if valid is None
             else jnp.asarray(valid, jnp.float32))
    if not presorted:
        # same ordering convention as ops.cox._sort_desc_by_time: descending
        # time, invalid rows pushed last via time -> -inf
        time = jnp.where(valid > 0, time, -jnp.inf)
        order = jnp.argsort(-time, stable=True)
        hazard, time, event, valid = (
            hazard[order], time[order], event[order], valid[order])

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
    )
    def _loss(h_l, e_l, v_l):
        h_masked = jnp.where(v_l > 0, h_l, _NEG)
        log_cumsum = _local_logcumsumexp_with_offset(h_masked, axis_name)
        e_l = e_l * v_l
        uncensored = jnp.where(e_l > 0, h_l - log_cumsum, 0.0)
        part = jnp.sum(uncensored * e_l)
        n_events = jax.lax.psum(jnp.sum(e_l), axis_name)
        n_valid = jax.lax.psum(jnp.sum(v_l), axis_name)
        total = jax.lax.psum(part, axis_name)
        loss = -total / (n_events + eps)
        ok = jnp.logical_and(n_valid >= 2, n_events > 0)
        return jnp.where(ok, loss, 0.0)

    # jit the shard_map: the eager transpose path trips a sharding-override
    # assert under jax.grad; under jit GSPMD owns the layout end to end
    return jax.jit(_loss)(hazard, event, valid)
