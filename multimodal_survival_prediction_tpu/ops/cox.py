"""Cox partial-likelihood loss, jit/shard-friendly.

Semantics match the reference's stable fallback (reference
final_multimodal.py:171-186 / partial_modality_training.py:296-311):

    order       = argsort(time, descending)
    log_cumsum  = logcumsumexp(hazard[order])
    loss        = -sum((hazard - log_cumsum) * event) / (sum(event) + 1e-8)

with the degenerate-batch guards (batch < 2 samples or 0 events -> loss 0,
reference final_multimodal.py:173-176) expressed as masked math rather than
Python control flow so the whole thing traces into one XLA computation.

Unlike the reference, padding/validity is first class: every entry carries a
``valid`` mask so fixed-shape (jit-stable) batches can represent ragged
DataLoader tails and unlabeled samples (the reference skips such batches in
Python, reference simple_fusion.py:257-268).

An Efron tie correction is available (``ties='efron'``) matching
torchsurv.loss.cox.neg_partial_log_likelihood's default handling of tied
event times; ``ties='breslow'`` (default) matches the reference fallback
exactly and is identical to Efron when event times are distinct.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1.0e30  # effectively -inf for logcumsumexp without producing NaNs


def _sort_desc_by_time(time, *arrays):
    """Stable sort by time descending; returns sorted copies of *arrays."""
    order = jnp.argsort(-time, stable=True)
    return tuple(a[order] for a in arrays)


def cox_partial_likelihood(
    hazard: jax.Array,
    time: jax.Array,
    event: jax.Array,
    valid: jax.Array | None = None,
    ties: str = "breslow",
    eps: float = 1e-8,
) -> jax.Array:
    """Negative Cox partial log-likelihood (mean over events).

    Args:
      hazard: (B,) predicted log-hazards.
      time:   (B,) survival/censoring times.
      event:  (B,) 1.0 if event observed, 0.0 if censored.
      valid:  optional (B,) 1.0 for real samples, 0.0 for padding / samples
              without survival labels. Invalid samples contribute neither to
              risk sets nor to the likelihood.
      ties:   'breslow' (reference-exact) or 'efron'.

    Returns scalar loss; exactly 0.0 when <2 valid samples or 0 valid events.
    """
    hazard = hazard.astype(jnp.float32)
    time = time.astype(jnp.float32)
    event = event.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones_like(event)
    else:
        valid = valid.astype(jnp.float32)

    event = event * valid
    # Invalid entries: push to the end of the descending-time order and
    # exclude from risk sets by sending their hazard to -inf-ish.
    time_k = jnp.where(valid > 0, time, -jnp.inf)
    h_masked = jnp.where(valid > 0, hazard, _NEG)

    h_s, e_s, t_s, v_s = _sort_desc_by_time(time_k, h_masked, event, time_k, valid)

    log_cumsum = jax.lax.cumlogsumexp(h_s, axis=0)

    if ties == "efron":
        # Efron: within a tied event-time group with d events, the k-th event
        # (k=0..d-1) sees risk-set logsumexp adjusted by log(1 - k/d * frac)
        # where frac = sum_exp(tied events) / sum_exp(risk set). Computed in
        # log space per sorted position.
        # Group id: positions sharing the same (valid) time.
        same_as_prev = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             (t_s[1:] == t_s[:-1]).astype(jnp.int32)]
        )
        group_start = 1 - same_as_prev
        group_id = jnp.cumsum(group_start) - 1
        n = h_s.shape[0]
        num_groups = n  # upper bound
        # sum over tied *events* of exp(h) per group (log-space via segment max)
        # Small B (<=1024): do it densely.
        onehot = (group_id[:, None] == jnp.arange(num_groups)[None, :]).astype(
            jnp.float32
        )
        ev_exp = jnp.exp(h_s - jax.lax.stop_gradient(jnp.max(h_s))) * e_s
        tie_sum = onehot.T @ ev_exp  # (G,)
        d_g = onehot.T @ e_s  # events per group
        # rank of each event within its tied group (0-based among events)
        cums_in_group = jnp.cumsum(onehot * e_s[:, None], axis=0)
        k_i = (cums_in_group * onehot).sum(-1) - e_s  # 0-based event rank
        # risk-set sum at group start = cumlogsumexp at the *last* index of the
        # group in descending-time order == value at positions of that group's
        # final member. Descending sort => all members of a tied group are
        # contiguous; the risk set for the group is log_cumsum at the group's
        # last position.
        is_last_in_group = jnp.concatenate(
            [(group_id[:-1] != group_id[1:]).astype(jnp.float32),
             jnp.ones((1,), jnp.float32)]
        )
        last_lcse = (onehot.T @ (log_cumsum * is_last_in_group))  # (G,)
        risk_exp_g = jnp.exp(last_lcse - jax.lax.stop_gradient(jnp.max(h_s)))
        frac_g = jnp.where(risk_exp_g > 0, tie_sum / jnp.maximum(risk_exp_g, 1e-38), 0.0)
        d_safe = jnp.maximum(d_g, 1.0)
        adj = jnp.log(
            jnp.clip(1.0 - (k_i / d_safe[group_id]) * frac_g[group_id], 1e-12, 1.0)
        )
        denom_i = last_lcse[group_id] + adj
        uncensored = h_s - denom_i
    else:
        uncensored = h_s - log_cumsum

    uncensored = jnp.where(e_s > 0, uncensored, 0.0)  # avoid NaN * 0
    n_events = jnp.sum(e_s)
    loss = -jnp.sum(uncensored * e_s) / (n_events + eps)

    # Degenerate-batch guards as masked math (reference
    # final_multimodal.py:173-176): <2 valid samples or 0 events -> 0.
    ok = jnp.logical_and(jnp.sum(v_s) >= 2, n_events > 0)
    return jnp.where(ok, loss, 0.0)


def gate_entropy_loss(gate_weights: jax.Array, valid: jax.Array | None = None,
                      eps: float = 1e-8) -> jax.Array:
    """Negative mean gate entropy (minimizing this maximizes entropy).

    Matches reference partial_modality_training.py:322-331; applied to ALL
    samples including unlabeled ones (reference :401-422), hence the separate
    ``valid`` mask defaulting to everything.
    """
    g = gate_weights.astype(jnp.float32)
    entropy = -jnp.sum(g * jnp.log(g + eps), axis=-1)  # (B,)
    if valid is None:
        return -jnp.mean(entropy)
    valid = valid.astype(jnp.float32)
    return -jnp.sum(entropy * valid) / jnp.maximum(jnp.sum(valid), 1.0)
