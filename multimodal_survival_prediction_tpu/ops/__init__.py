"""Numeric ops: Cox partial likelihood, C-index, Kaplan-Meier, resampling."""

from .cox import cox_partial_likelihood, gate_entropy_loss  # noqa: F401
from .cindex import concordance_index  # noqa: F401
from .km import kaplan_meier, logrank_test, median_survival_time  # noqa: F401
