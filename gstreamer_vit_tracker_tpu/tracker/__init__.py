"""Functional tracking core with HBM-resident state and batched variants."""

from . import core, multi, scan, state  # noqa: F401
from .core import init, init_jit, update, update_jit  # noqa: F401
from .state import TrackState, stack_states, zeros_state  # noqa: F401
