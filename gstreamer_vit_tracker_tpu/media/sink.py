"""Frame sinks: file recording and a null display stand-in.

The reference displays through DRM/KMS (``kmssink`` with ``sync=false``,
/root/reference/src/pipeline_ir.rs:80-84).  Headless TPU hosts have no
display plane; the equivalents here are a recording sink (for golden
inspection) and a null sink that only counts frames — both honour the
"never block the processing path" contract.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class NullSink:
    """Counts frames; the default headless 'display'."""

    def __init__(self):
        self.frames = 0
        self.last_frame: Optional[np.ndarray] = None

    def write(self, frame: np.ndarray) -> None:
        self.frames += 1
        self.last_frame = frame

    def close(self) -> None:
        pass


class FileSink:
    """Collects frames and writes an (N, H, W, 3) uint8 .npy on close."""

    def __init__(self, path: str, max_frames: int = 10_000):
        self.path = path
        self.max_frames = max_frames
        self._frames: List[np.ndarray] = []

    def write(self, frame: np.ndarray) -> None:
        if len(self._frames) < self.max_frames:
            self._frames.append(np.asarray(frame))

    def close(self) -> None:
        if self._frames:
            np.save(self.path, np.stack(self._frames))

    @property
    def frames(self) -> int:
        return len(self._frames)
