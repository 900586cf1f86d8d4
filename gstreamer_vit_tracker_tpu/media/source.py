"""Frame sources: synthetic video, file playback, optional V4L2.

The reference's only source is a V4L2 camera (/root/reference/src/main.rs:32,
pipeline_ir.rs:21-41).  For a portable framework we add deterministic
synthetic video (the test/bench workhorse — SURVEY.md §4 "tracker
integration: synthetic video (moving patterned square)") and file playback,
with the same iterator interface.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["SyntheticSource", "FileSource", "V4L2Source",
           "rgb_to_nv12_planes", "rgb_to_yuy2"]


def rgb_to_yuy2(rgb: np.ndarray) -> np.ndarray:
    """Forward BT.601 RGB -> packed YUY2 rows (H, W*2) uint8; chroma is
    averaged over horizontal pixel pairs (4:2:2)."""
    h, w = rgb.shape[:2]
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    y = 16 + (65.738 * r + 129.057 * g + 25.064 * b) / 256
    u = 128 + (-37.945 * r - 74.494 * g + 112.439 * b) / 256
    v = 128 + (112.439 * r - 94.154 * g - 18.285 * b) / 256
    u2 = u.reshape(h, w // 2, 2).mean(axis=-1)
    v2 = v.reshape(h, w // 2, 2).mean(axis=-1)
    quads = np.empty((h, w // 2, 4), np.float32)
    quads[..., 0] = y[:, 0::2]
    quads[..., 1] = u2
    quads[..., 2] = y[:, 1::2]
    quads[..., 3] = v2
    return np.clip(np.round(quads), 0, 255).astype(np.uint8).reshape(h, w * 2)


def rgb_to_nv12_planes(rgb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Forward BT.601 limited-range RGB -> NV12 planes (Y (H,W), UV
    (H/2, W/2, 2)).  Chroma is averaged over each 2x2 block (standard 4:2:0
    downsampling)."""
    h, w = rgb.shape[:2]
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    y = 16 + (65.738 * r + 129.057 * g + 25.064 * b) / 256
    u = 128 + (-37.945 * r - 74.494 * g + 112.439 * b) / 256
    v = 128 + (112.439 * r - 94.154 * g - 18.285 * b) / 256
    u = u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    v = v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    y = np.clip(np.round(y), 16, 235).astype(np.uint8)
    uv = np.stack([np.clip(np.round(u), 16, 240),
                   np.clip(np.round(v), 16, 240)], axis=-1).astype(np.uint8)
    return y, uv


class SyntheticSource:
    """Deterministic moving-target video.

    A patterned square glides over a smooth textured background along a
    Lissajous path.  ``bbox_at(i)`` gives the ground-truth box, enabling
    IoU assertions (the parity harness the reference never had,
    SURVEY.md §4).
    """

    def __init__(self, width: int = 640, height: int = 512, fps: int = 60,
                 obj_size: int = 64, seed: int = 0, fmt: str = "rgb",
                 speed: float = 2.0, appearance_drift: float = 0.0):
        assert fmt in ("rgb", "nv12", "yuy2")
        # appearance_drift > 0 darkens the target over time (tests the
        # online template update, BASELINE.json config 3).
        self.appearance_drift = appearance_drift
        self.width = width
        self.height = height
        self.fps = fps
        self.obj_size = obj_size
        self.fmt = fmt
        self.speed = speed
        rng = np.random.default_rng(seed)
        # Smooth background: coarse noise, bilinear-upsampled.
        coarse = rng.integers(40, 140, size=(8, 8, 3)).astype(np.float32)
        ys = np.linspace(0, 7, height)
        xs = np.linspace(0, 7, width)
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        fy = (ys - y0)[:, None, None]
        fx = (xs - x0)[None, :, None]
        y1 = np.minimum(y0 + 1, 7)
        x1 = np.minimum(x0 + 1, 7)
        bg = ((1 - fy) * (1 - fx) * coarse[y0][:, x0]
              + (1 - fy) * fx * coarse[y0][:, x1]
              + fy * (1 - fx) * coarse[y1][:, x0]
              + fy * fx * coarse[y1][:, x1])
        self.background = np.clip(bg, 0, 255).astype(np.uint8)
        # Object: smooth, aperiodic, high-saturation patch with a bright
        # border.  (A periodic checkerboard would alias under correlation —
        # multiple shifts match equally well.)
        s = obj_size
        pc = rng.integers(0, 256, size=(4, 4, 3)).astype(np.float32)
        pys = np.linspace(0, 3, s)
        pxs = np.linspace(0, 3, s)
        py0 = np.floor(pys).astype(int)
        px0 = np.floor(pxs).astype(int)
        pfy = (pys - py0)[:, None, None]
        pfx = (pxs - px0)[None, :, None]
        py1 = np.minimum(py0 + 1, 3)
        px1 = np.minimum(px0 + 1, 3)
        patch = ((1 - pfy) * (1 - pfx) * pc[py0][:, px0]
                 + (1 - pfy) * pfx * pc[py0][:, px1]
                 + pfy * (1 - pfx) * pc[py1][:, px0]
                 + pfy * pfx * pc[py1][:, px1])
        yy, xx = np.mgrid[0:s, 0:s]
        border = (yy < 3) | (yy >= s - 3) | (xx < 3) | (xx >= s - 3)
        patch[border] = (250, 250, 250)
        self.patch = np.clip(patch, 0, 255).astype(np.uint8)

    def bbox_at(self, i: int) -> Tuple[float, float, float, float]:
        """Ground-truth (x, y, w, h) at frame ``i``."""
        s = self.obj_size
        ax = (self.width - s - 20) / 2
        ay = (self.height - s - 20) / 2
        t = i * self.speed / 100.0
        cx = self.width / 2 + ax * np.sin(1.0 * t)
        cy = self.height / 2 + ay * np.sin(0.7 * t + 1.0)
        return (float(cx - s / 2), float(cy - s / 2), float(s), float(s))

    def frame_rgb_at(self, x: float, y: float, i: int = 0
                     ) -> Tuple[np.ndarray, Tuple[float, float, float, float]]:
        """Render the scene with the target at an arbitrary top-left
        (clamped inside the frame); returns (frame, actual bbox).  Used by
        the training data generator to place targets hard against frame
        borders — the zero-padding regime the Lissajous path rarely
        reaches (round-2 long-horizon robustness work)."""
        img = self.background.copy()
        w = h = self.obj_size
        xi = max(0, min(self.width - w, int(round(x))))
        yi = max(0, min(self.height - h, int(round(y))))
        patch = self.patch
        if self.appearance_drift:
            fade = max(0.25, 1.0 - self.appearance_drift * i)
            patch = (patch.astype(np.float32) * fade).astype(np.uint8)
        img[yi:yi + h, xi:xi + w] = patch
        return img, (float(xi), float(yi), float(w), float(h))

    def frame_rgb(self, i: int) -> np.ndarray:
        x, y, _, _ = self.bbox_at(i)
        img, _ = self.frame_rgb_at(x, y, i)
        return img

    def frame(self, i: int):
        rgb = self.frame_rgb(i)
        if self.fmt == "rgb":
            return rgb
        if self.fmt == "yuy2":
            return rgb_to_yuy2(rgb)
        return rgb_to_nv12_planes(rgb)

    def __iter__(self) -> Iterator:
        i = 0
        while True:
            yield self.frame(i)
            i += 1


class FileSource:
    """Plays back a stack of frames from a .npy file.

    RGB: array (N, H, W, 3) uint8.  NV12: ``.npz`` with arrays ``y``
    (N, H, W) and ``uv`` (N, H/2, W/2, 2).
    """

    def __init__(self, path: str, fps: int = 60, loop: bool = False):
        self.fps = fps
        self.loop = loop
        if path.endswith(".npz"):
            data = np.load(path)
            self._y, self._uv = data["y"], data["uv"]
            self.fmt = "nv12"
            self.num_frames = len(self._y)
            self.height, self.width = self._y.shape[1:3]
        else:
            self._frames = np.load(path)
            self.fmt = "rgb"
            self.num_frames = len(self._frames)
            self.height, self.width = self._frames.shape[1:3]

    def frame(self, i: int):
        if self.loop:
            i = i % self.num_frames
        if self.fmt == "rgb":
            return self._frames[i]
        return self._y[i], self._uv[i]

    def __iter__(self) -> Iterator:
        i = 0
        while self.loop or i < self.num_frames:
            yield self.frame(i)
            i += 1


class V4L2Source:
    """Real V4L2 capture (YUY2) via the framework's own ioctl/mmap stack
    (media/v4l2.py): VIDIOC_S_FMT negotiation, mmap streaming buffers,
    QBUF/DQBUF ring — the caps the reference's v4l2src negotiates
    (pipeline_ir.rs:21-41: YUY2 640x512@60, io-mode dmabuf; mmap streaming
    is the userspace analog).  Used only when a camera node exists — the
    reference hard-fails without one (main.rs:34-36); we degrade to the
    synthetic source instead."""

    def __init__(self, device: str = "/dev/video21", width: int = 640,
                 height: int = 512, fps: int = 60):
        if not os.path.exists(device):
            raise FileNotFoundError(f"Camera not found: {device}")
        from .v4l2 import V4L2Capture

        self.device = device
        self.fps = fps
        self.fmt = "yuy2"
        self._cap = V4L2Capture(device, width, height, fps=fps)
        # Negotiated geometry may differ from the request; expose the
        # ACTUAL frame shape to the pipeline.
        self._started = False
        self.width = width
        self.height = height

    def open(self):
        self._cap.start()
        self.width = self._cap.width
        self.height = self._cap.height
        self._started = True

    def frame(self, i: int) -> np.ndarray:
        if not self._started:
            self.open()
        data = self._cap.read_frame()
        n = self.width * self.height * 2
        if data.size < n:
            data = np.pad(data, (0, n - data.size))
        # Packed YUY2 rows, the tracker's "yuy2" frame layout.
        return data[:n].reshape(self.height, self.width * 2)

    def close(self):
        if self._started:
            self._cap.stop()
            self._started = False


class FlakySource:
    """Fault-injection wrapper: drops, repeats, or corrupts frames.

    The reference has no fault-injection hooks (SURVEY.md §5); this wrapper
    adds them for resilience testing — the session machine must survive
    stalled/corrupted input by riding its Lost/auto-reset path rather than
    crashing.
    """

    def __init__(self, inner, drop_every: int = 0, corrupt_every: int = 0,
                 seed: int = 0):
        self.inner = inner
        self.drop_every = drop_every
        self.corrupt_every = corrupt_every
        self.width = inner.width
        self.height = inner.height
        self.fps = getattr(inner, "fps", 60)
        self.fmt = getattr(inner, "fmt", "rgb")
        self._rng = np.random.default_rng(seed)
        self._last = None

    def frame(self, i: int):
        f = self.inner.frame(i)
        if self.drop_every and i and i % self.drop_every == 0:
            # Dropped frame: deliver the previous one again (camera stall).
            f = self._last if self._last is not None else f
        elif self.corrupt_every and i and i % self.corrupt_every == 0:
            if isinstance(f, tuple):
                y, uv = f
                f = (self._rng.integers(0, 256, y.shape).astype(np.uint8), uv)
            else:
                f = self._rng.integers(0, 256, np.asarray(f).shape).astype(np.uint8)
        self._last = f
        return f
