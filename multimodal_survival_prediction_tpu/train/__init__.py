"""Training engine: jitted scan-based epochs, K-fold CV driver, schedules."""

from .engine import TrainState, Trainer, TrainConfig  # noqa: F401
from .schedules import ReduceLROnPlateau, cosine_annealing  # noqa: F401
