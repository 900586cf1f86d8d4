"""Training losses for the VitTrack heads.

The reference consumes a pre-trained RKNN blob and has no training story;
a complete framework must be able to (re)train its flagship model.  These
are the standard OSTrack/CenterNet-family losses for centre-score + offset
+ size tracking heads:

* penalty-reduced focal loss on a gaussian-splatted centre map;
* L1 on the sub-cell offset and the normalised size at the target cell;
* generalised IoU on the decoded box.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

__all__ = ["centre_cell", "gaussian_target", "focal_loss", "l1_at_cell",
           "giou_loss", "total_loss"]


def centre_cell(fs: int, cxy_norm: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The (cy, cx) integer cell containing the normalised centre — the ONE
    rule shared by the focal-target pin and the offset/size supervision
    (a pin/supervision disagreement at cell boundaries would train the
    regression at a cell labelled negative)."""
    cx = jnp.clip(jnp.floor(cxy_norm[0] * fs).astype(jnp.int32), 0, fs - 1)
    cy = jnp.clip(jnp.floor(cxy_norm[1] * fs).astype(jnp.int32), 0, fs - 1)
    return cy, cx


def gaussian_target(fs: int, cxy_norm: jnp.ndarray, sigma_cells: float = 1.0
                    ) -> jnp.ndarray:
    """(fs, fs) gaussian centred at the normalised target centre, with the
    centre *cell* pinned to exactly 1.0 (CenterNet convention — the focal
    loss identifies positives as ``target == 1``; without the pin the
    continuous gaussian peak usually falls between cells and every cell
    would train as a negative, collapsing the score map).  The pinned cell
    comes from :func:`centre_cell` so it always matches the cell whose
    offset/size regressions are supervised."""
    gx = cxy_norm[0] * fs - 0.5
    gy = cxy_norm[1] * fs - 0.5
    xs = jnp.arange(fs, dtype=jnp.float32)
    dx2 = (xs[None, :] - gx) ** 2
    dy2 = (xs[:, None] - gy) ** 2
    t = jnp.exp(-(dx2 + dy2) / (2.0 * sigma_cells ** 2))
    cy_cell, cx_cell = centre_cell(fs, cxy_norm)
    return t.at[cy_cell, cx_cell].set(1.0)


def focal_loss(score: jnp.ndarray, target: jnp.ndarray,
               alpha: float = 2.0, beta: float = 4.0) -> jnp.ndarray:
    """CenterNet penalty-reduced pixel-wise focal loss.

    ``score`` in (0, 1); ``target`` gaussian with 1.0 at the centre cell.
    """
    eps = 1e-6
    score = jnp.clip(score, eps, 1.0 - eps)
    pos = (target > 0.999).astype(jnp.float32)
    neg = 1.0 - pos
    pos_loss = -pos * ((1.0 - score) ** alpha) * jnp.log(score)
    neg_loss = -neg * ((1.0 - target) ** beta) * (score ** alpha) * jnp.log(1.0 - score)
    num_pos = jnp.maximum(pos.sum(), 1.0)
    return (pos_loss.sum() + neg_loss.sum()) / num_pos


def l1_at_cell(pred_map: jnp.ndarray, target_vec: jnp.ndarray,
               cell_yx: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
    """L1 between ``pred_map[cy, cx]`` (fs, fs, 2) and a length-2 target."""
    cy, cx = cell_yx
    return jnp.abs(pred_map[cy, cx] - target_vec).mean()


def _boxes_xyxy(cxywh: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = cxywh[0], cxywh[1], cxywh[2], cxywh[3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])


def giou_loss(pred_cxywh: jnp.ndarray, gt_cxywh: jnp.ndarray) -> jnp.ndarray:
    """1 - GIoU of two (cx, cy, w, h) boxes in normalised coordinates."""
    a = _boxes_xyxy(pred_cxywh)
    b = _boxes_xyxy(gt_cxywh)
    ix1 = jnp.maximum(a[0], b[0])
    iy1 = jnp.maximum(a[1], b[1])
    ix2 = jnp.minimum(a[2], b[2])
    iy2 = jnp.minimum(a[3], b[3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area_a = jnp.clip(a[2] - a[0], 0) * jnp.clip(a[3] - a[1], 0)
    area_b = jnp.clip(b[2] - b[0], 0) * jnp.clip(b[3] - b[1], 0)
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-6)
    ex1 = jnp.minimum(a[0], b[0])
    ey1 = jnp.minimum(a[1], b[1])
    ex2 = jnp.maximum(a[2], b[2])
    ey2 = jnp.maximum(a[3], b[3])
    hull = jnp.clip(ex2 - ex1, 0) * jnp.clip(ey2 - ey1, 0)
    giou = iou - (hull - union) / jnp.maximum(hull, 1e-6)
    return 1.0 - giou


def total_loss(score: jnp.ndarray, offset: jnp.ndarray, size: jnp.ndarray,
               gt_bbox_norm: jnp.ndarray, visible: jnp.ndarray | None = None,
               w_focal: float = 1.0, w_l1: float = 5.0, w_giou: float = 2.0
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined loss for ONE sample.

    ``score`` (fs, fs); ``offset``/``size`` (fs, fs, 2);
    ``gt_bbox_norm`` = (cx, cy, w, h) normalised to the search crop.

    ``visible`` (scalar in {0, 1} or None==1): a fully-occluded sample
    trains the score map to ALL-NEGATIVE (no positive cell, so the model
    learns to report low confidence when the target is hidden — what the
    session machine's 0.25 Lost threshold keys on,
    /root/reference/src/tracker_context.rs:122-138) and masks out the
    offset/size/giou regressions, whose labels point at an invisible box.
    """
    fs = score.shape[-1]
    vis = jnp.float32(1.0) if visible is None else visible.astype(jnp.float32)
    target = gaussian_target(fs, gt_bbox_norm[:2]) * vis
    lf = focal_loss(score, target)

    cy_cell, cx_cell = centre_cell(fs, gt_bbox_norm[:2])
    gt_off = jnp.stack([gt_bbox_norm[0] * fs - cx_cell,
                        gt_bbox_norm[1] * fs - cy_cell])
    lo = l1_at_cell(offset, gt_off, (cy_cell, cx_cell)) * vis
    ls = l1_at_cell(size, gt_bbox_norm[2:4], (cy_cell, cx_cell)) * vis

    pred = jnp.concatenate([
        (jnp.stack([cx_cell, cy_cell]).astype(jnp.float32)
         + offset[cy_cell, cx_cell]) / fs,
        size[cy_cell, cx_cell],
    ])
    lg = giou_loss(pred, gt_bbox_norm) * vis

    total = w_focal * lf + w_l1 * (lo + ls) + w_giou * lg
    return total, {"focal": lf, "l1_offset": lo, "l1_size": ls, "giou": lg}
