"""Utilities: rolling timing stats, logging helpers."""

from . import timing  # noqa: F401
from .timing import TimingStats  # noqa: F401
