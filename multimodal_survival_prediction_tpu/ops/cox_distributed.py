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

``ties='efron'`` is supported distributed as well: each shard computes
segmented per-tie-group statistics locally (event count, event logsumexp,
risk-set prefix at group end, within-group event rank), then one O(shards)
all-gather of 8 boundary scalars per shard stitches the groups that straddle
shard boundaries — a tie group spanning any number of shards combines
correctly because globally-sorted equal times are contiguous, so a shard
contributes to a neighbour's group only through its first/last segment.
Semantics match ops.cox.cox_partial_likelihood(ties='efron') (tested to
float tolerance, gradients included).
"""

from __future__ import annotations

from functools import lru_cache, partial

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


def _efron_shard_part(h_l, e_l, t_l, v_l, axis_name):
    """Shard-local Efron partial sum: sum over this shard's events of
    (hazard - Efron denominator), with tie groups stitched across shard
    boundaries via one (n_shards, 8) all-gather.

    Matches ops.cox's Efron branch (torchsurv semantics): the k-th event
    (k=0..d-1) in a tied group sees denominator
    ``R_g + log(1 - k/d * exp(T_g - R_g))`` where R_g is the risk-set
    logsumexp at the group's end and T_g the logsumexp over the group's
    event hazards."""
    n = h_l.shape[0]
    h_masked = jnp.where(v_l > 0, h_l, _NEG)
    # full prefix logcumsumexp (risk sets), offset by earlier shards
    pre = _local_logcumsumexp_with_offset(h_masked, axis_name)

    # ---- within-shard tie segments (equal times are contiguous) ----
    start = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (t_l[1:] != t_l[:-1]).astype(jnp.int32)])
    seg = jnp.cumsum(start) - 1  # (n,) segment id in [0, n)

    def seg_lse(x):
        m = jax.lax.stop_gradient(
            jax.ops.segment_max(x, seg, num_segments=n))
        m = jnp.maximum(m, _NEG)  # empty segments -> finite, not -inf
        s = jax.ops.segment_sum(jnp.exp(x - m[seg]), seg, num_segments=n)
        return m + jnp.log(jnp.maximum(s, 1e-38))

    ev_h = jnp.where(e_l > 0, h_l, _NEG)
    T_loc = seg_lse(ev_h)       # (n,) per-segment LSE over EVENT hazards
    A_loc = seg_lse(h_masked)   # per-segment LSE over ALL valid hazards
    d_loc = jax.ops.segment_sum(e_l, seg, num_segments=n)
    # pre is nondecreasing -> segment max == value at the segment's end
    R_loc = jax.ops.segment_max(pre, seg, num_segments=n)
    # 0-based event rank within the segment: exclusive event cumsum minus
    # its value at the segment start (nondecreasing -> segment min)
    c = jnp.cumsum(e_l) - e_l
    rank = c - jax.ops.segment_min(c, seg, num_segments=n)[seg]

    # ---- boundary combine: 8 scalars per shard ----
    s_last = seg[-1]
    summary = jnp.stack([
        t_l[0], t_l[-1],
        T_loc[0], T_loc[s_last],
        d_loc[0], d_loc[s_last],
        A_loc[0], A_loc[s_last],
    ])
    S = jax.lax.all_gather(summary, axis_name)  # (n_shards, 8)
    idx = jax.lax.axis_index(axis_name)
    shard_ids = jnp.arange(S.shape[0])
    # shards BEFORE us whose last segment shares our first time: they hold
    # earlier members of our first group (descending sort -> such a shard
    # touches the group only through its last segment, or is entirely the
    # group, in which case its last segment IS the whole shard)
    sel_l = jnp.logical_and(shard_ids < idx, S[:, 1] == t_l[0])
    T_left = jax.nn.logsumexp(jnp.where(sel_l, S[:, 3], _NEG))
    d_left = jnp.sum(jnp.where(sel_l, S[:, 5], 0.0))
    # shards AFTER us whose first segment shares our last time: later
    # members of our last group
    sel_r = jnp.logical_and(shard_ids > idx, S[:, 0] == t_l[-1])
    T_right = jax.nn.logsumexp(jnp.where(sel_r, S[:, 2], _NEG))
    d_right = jnp.sum(jnp.where(sel_r, S[:, 4], 0.0))
    A_right = jax.nn.logsumexp(jnp.where(sel_r, S[:, 6], _NEG))

    seg_ids = jnp.arange(n)
    is_first = seg_ids == 0
    is_last = seg_ids == s_last
    T_g = jnp.logaddexp(T_loc, jnp.where(is_first, T_left, _NEG))
    T_g = jnp.logaddexp(T_g, jnp.where(is_last, T_right, _NEG))
    d_g = (d_loc + jnp.where(is_first, d_left, 0.0)
           + jnp.where(is_last, d_right, 0.0))
    # risk set at group end: in-shard prefix end, plus the continuation's
    # (ALL-row) mass when the group runs into later shards
    R_g = jnp.logaddexp(R_loc, jnp.where(is_last, A_right, _NEG))
    # events of the same group in earlier shards occupy the first ranks
    rank = rank + jnp.where(seg == 0, d_left, 0.0)

    frac = jnp.exp(T_g - R_g)
    d_safe = jnp.maximum(d_g, 1.0)
    adj = jnp.log(jnp.clip(
        1.0 - (rank / d_safe[seg]) * frac[seg], 1e-12, 1.0))
    denom = R_g[seg] + adj
    uncensored = jnp.where(e_l > 0, h_l - denom, 0.0)
    return jnp.sum(uncensored * e_l)


def cox_partial_likelihood_sharded(
    hazard, time, event, mesh: Mesh, axis_name: str = "data",
    valid=None, eps: float = 1e-8, presorted: bool = True,
    ties: str = "breslow",
):
    """Cox NLL with the batch axis sharded over `axis_name`.

    With ``presorted=True`` (default) inputs must be GLOBALLY sorted by time
    descending BEFORE sharding (the caller owns the distributed sort; for
    cohort-scale data this is a host argsort, for truly huge data a device
    sample-sort). ``presorted=False`` sorts on device first — the mode the
    training engine uses (`Trainer(sharded_risk_set=True)`): batches arrive
    in shuffle order, the argsort+gather is O(B) device work and XLA owns the
    resulting resharding. Semantics match
    ops.cox.cox_partial_likelihood including the degenerate-batch guards,
    for both ``ties='breslow'`` (default, reference-exact) and
    ``ties='efron'`` (cross-shard tie groups stitched via an O(shards)
    boundary all-gather — see _efron_shard_part).
    """
    if ties not in ("breslow", "efron"):
        raise ValueError(f"unknown ties rule {ties!r}")
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
    elif ties == "efron":
        # Efron's segments key on contiguous runs of equal time. Invalid rows
        # carry no mass (hazards masked, events zeroed) but their POSITION
        # could still split a run, so give each one the nearest preceding
        # valid time — cummin works because valid times are descending; rows
        # before any valid become their own zero-mass +inf segment. This
        # keeps 'globally sorted by time descending' sufficient even when a
        # presorted caller left invalid rows interleaved at their raw times
        # (ops.cox._sort_desc_by_time order, invalids last, also satisfies
        # it: its trailing rows then inherit the last valid time).
        time = jax.lax.cummin(jnp.where(valid > 0, time, jnp.inf))

    return _sharded_loss_fn(mesh, axis_name, ties, eps)(
        hazard, event, time, valid)


@lru_cache(maxsize=16)
def _sharded_loss_fn(mesh: Mesh, axis_name: str, ties: str, eps: float):
    """Jitted shard_map loss, cached on its static config.

    Building (and jitting) a fresh closure per call would make every direct
    (non-traced) caller retrace and recompile — multi-minute remote compiles
    on the axon tunnel, uncached (CLAUDE.md). Mesh is hashable, so the
    executable is reused across calls with the same (mesh, axis, ties, eps).
    Bounded: each entry pins its Mesh (devices) and compiled programs for
    process lifetime; callers that build fresh meshes per run (the test
    suite, notebooks) must not accumulate entries forever. Real processes
    use one or two mesh configs, so 16 keeps the hot entries resident.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name),) * 4,
        out_specs=P(),
    )
    def _loss(h_l, e_l, t_l, v_l):
        e_l = e_l * v_l
        if ties == "efron":
            part = _efron_shard_part(h_l, e_l, t_l, v_l, axis_name)
        else:
            h_masked = jnp.where(v_l > 0, h_l, _NEG)
            log_cumsum = _local_logcumsumexp_with_offset(h_masked, axis_name)
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
    return jax.jit(_loss)
