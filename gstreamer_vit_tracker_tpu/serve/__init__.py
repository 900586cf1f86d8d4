"""Multi-stream tracking service: batch-serving the tracker over TCP.

The TPU-native serving tier (SlotEngine: one static-shape batched step,
dynamic streams as masked slots) exposed through a dependency-free wire
protocol.  The reference has no serving surface (in-process pad-probe
loop only, SURVEY.md §3.2) — this package is the framework extension
that makes the batching story externally reachable.
"""

from .client import TrackClient, TrackServiceError
from .engine import SlotEngine
from .server import TrackServer

__all__ = ["SlotEngine", "TrackServer", "TrackClient", "TrackServiceError"]
