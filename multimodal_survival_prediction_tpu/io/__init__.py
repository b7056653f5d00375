"""Artifact I/O: cv_results.json writers (reference schemas), checkpoints."""

from .results import write_cv_results, load_cv_results  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
