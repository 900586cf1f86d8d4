"""Training subsystem: losses, synthetic data, sharded train step."""

from . import data, losses, step  # noqa: F401
from .step import (TrainState, create_train_state, make_optimizer,  # noqa: F401
                   train_scan, train_step)
