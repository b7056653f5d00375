"""Harrell's concordance index, vectorized (O(n^2) outer products, no loops).

The reference computes C-index three ways (SURVEY §2.5): torchsurv's
ConcordanceIndex (primary), lifelines' concordance_index (negated risk), or a
hand-rolled O(n^2) double loop (reference train_rnaseq_only.py:55-70). All
agree on distinct times/predictions; we implement Harrell's definition with
the standard 0.5 credit for tied predictions (torchsurv/lifelines behavior)
plus a ``naive`` variant bit-matching the reference's double loop.

Cohorts are <=608 patients, so the dense (n,n) formulation is trivially small
and maps onto the VPU; it is also jit-able for on-device epoch evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def concordance_index(hazard, time, event, valid=None, variant: str = "harrell"):
    """Concordance index of risk scores vs survival outcomes.

    Higher hazard should predict shorter survival. Returns scalar in [0,1];
    0.5 if there are no comparable pairs (reference fallback returns 0.5 on
    failure, reference partial_modality_training.py:336-340).

    Args:
      hazard: (n,) risk scores (higher = riskier).
      time:   (n,) times.
      event:  (n,) event indicators (1=event, 0=censored).
      valid:  optional (n,) validity mask for padded batches.
      variant: 'harrell' (ties in prediction get 0.5; tied-time event/censored
               pairs comparable) or 'naive' (bit-matches the reference double
               loop, train_rnaseq_only.py:55-70: pairs are (i event,
               time_j > time_i) only, and tied predictions get 0 credit —
               `if log_hazard[i] > log_hazard[j]` is strict).
    """
    hazard = jnp.asarray(hazard, jnp.float32)
    time = jnp.asarray(time, jnp.float32)
    event = jnp.asarray(event, jnp.float32)
    if valid is None:
        valid = jnp.ones_like(event)
    else:
        valid = jnp.asarray(valid, jnp.float32)

    t_i = time[:, None]
    t_j = time[None, :]
    e_i = event[:, None]
    h_i = hazard[:, None]
    h_j = hazard[None, :]
    vv = valid[:, None] * valid[None, :]

    if variant == "naive":
        comparable = (e_i > 0) & (t_j > t_i)
    else:
        # Harrell: i experienced the event first.
        #  - t_i < t_j and event_i            -> comparable
        #  - t_i == t_j and event_i and not event_j -> comparable
        e_j = event[None, :]
        comparable = ((t_i < t_j) & (e_i > 0)) | (
            (t_i == t_j) & (e_i > 0) & (e_j == 0)
        )

    comparable = comparable.astype(jnp.float32) * vv
    if variant == "naive":
        # strict inequality only — reference counts tied predictions as 0
        concordant = jnp.where(h_i > h_j, 1.0, 0.0)
    else:
        concordant = jnp.where(
            h_i > h_j, 1.0, jnp.where(h_i == h_j, 0.5, 0.0))

    num = jnp.sum(comparable * concordant)
    den = jnp.sum(comparable)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.5)


def concordance_index_np(hazard, time, event, variant: str = "harrell") -> float:
    """Host/numpy convenience wrapper (analysis layer)."""
    return float(
        concordance_index(
            jnp.asarray(np.asarray(hazard)),
            jnp.asarray(np.asarray(time)),
            jnp.asarray(np.asarray(event)),
            variant=variant,
        )
    )
