"""Synthetic template/search training pairs.

Deterministic generator producing (template crop, search crop, gt bbox in
crop-normalised coords) batches from procedurally generated scenes — the
same moving-patterned-target family as media.source.SyntheticSource, which
keeps the whole train/eval story self-contained (the reference repo ships
no data or training assets at all).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from ..config import ModelConfig
from ..media.source import SyntheticSource
from ..ops import preprocess as pp


def _normalize(img: np.ndarray, cfg: ModelConfig) -> np.ndarray:
    x = img.astype(np.float32) / 255.0
    return (x - np.asarray(cfg.norm_mean)) / np.asarray(cfg.norm_std)


def _crop_np(img: np.ndarray, cx: float, cy: float, size: float,
             out: int) -> np.ndarray:
    """Host-side bilinear square crop with zero padding (training data is
    produced on host; the device path uses ops.preprocess)."""
    import jax.numpy as jnp

    win = pp.CropWindow(cx=jnp.float32(cx), cy=jnp.float32(cy),
                        size=jnp.float32(size))
    # Reuse the device implementation for bit-identical geometry.
    return np.asarray(pp.preprocess_rgb(jnp.asarray(img), win, out,
                                        (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)))


def make_batch(rng: np.random.Generator, batch: int, cfg: ModelConfig
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (z_imgs (B,Hz,Wz,3), x_imgs (B,Hx,Wx,3), gt (B,4)) —
    normalised crops + (cx, cy, w, h) in search-crop-normalised coords."""
    z_list, x_list, gt_list = [], [], []
    for _ in range(batch):
        seed = int(rng.integers(0, 2 ** 31))
        obj = int(rng.integers(32, 72))
        src = SyntheticSource(320, 256, obj_size=obj, seed=seed)
        i = int(rng.integers(0, 200))
        frame = src.frame_rgb(i)
        x, y, w, h = src.bbox_at(i)
        cx, cy = x + w / 2, y + h / 2

        # Template: exact window around the target.
        zsize = float(np.ceil(cfg.template_factor * np.sqrt(w * h)))
        z = _crop_np(frame, cx, cy, zsize, cfg.template_size)

        # Search: window around a jittered box (simulating motion between
        # frames); gt expressed inside that window.
        jx = cx + rng.uniform(-0.5, 0.5) * w
        jy = cy + rng.uniform(-0.5, 0.5) * h
        ssize = float(np.ceil(cfg.search_factor * np.sqrt(w * h)))
        xim = _crop_np(frame, jx, jy, ssize, cfg.search_size)

        ox, oy = jx - ssize / 2, jy - ssize / 2
        gt = np.array([(cx - ox) / ssize, (cy - oy) / ssize,
                       w / ssize, h / ssize], np.float32)

        z_list.append(_normalize(z, cfg))
        x_list.append(_normalize(xim, cfg))
        gt_list.append(gt)
    return (np.stack(z_list), np.stack(x_list), np.stack(gt_list))


def batch_iterator(seed: int, batch: int, cfg: ModelConfig
                   ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    rng = np.random.default_rng(seed)
    while True:
        yield make_batch(rng, batch, cfg)
