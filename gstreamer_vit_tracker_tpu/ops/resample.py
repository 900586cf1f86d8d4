"""Crop / resize as matrix multiplication — the TPU-native resampler.

The reference delegates image resampling to two native engines: OpenCV's
``resize`` inside the vit_tracker crate (SURVEY.md §2.9: crop/resize of the
template and search regions) and the Rockchip RGA 2-D engine for the display
upscale (``rgaconvert``, /root/reference/src/pipeline_ir.rs:62).  Neither a
per-pixel gather loop nor a hardware blitter is the right shape for a TPU;
what the TPU has is an MXU.

Bilinear resampling is a separable linear map, so a crop+resize is exactly

    out = R @ img @ C^T

where ``R`` (out_h, src_h) and ``C`` (out_w, src_w) hold the bilinear hat
weights of each output row/column against the source grid.  Both matrices
are built *inside* the jitted program from ``iota`` comparisons — no host
round-trip, no dynamic shapes, no gather — and the two matmuls run on the
MXU.  Out-of-window samples get zero weight, which reproduces
zero-border-constant padding (the OSTrack/VitTrack crop convention).

Sampling uses half-pixel-center alignment (``s_i = start + (i+0.5)*scale -
0.5``), matching ``cv2.resize`` / ``jax.image.resize(method='linear')``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "sampling_matrix",
    "fold_half_res",
    "crop_resize",
    "crop_resize_chw",
    "resize_static",
]


def sampling_matrix(out_size: int, src_size: int, start, scale,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Build the (out_size, src_size) bilinear sampling matrix.

    ``start`` (source coordinate of the window origin, in pixels) and
    ``scale`` (source pixels per output pixel) may be traced scalars; the
    result shape is static.  Output pixel ``i`` samples source coordinate
    ``start + (i + 0.5) * scale - 0.5``; weights are the bilinear hat
    ``max(0, 1 - |s - j|)``, so coordinates outside ``[0, src)`` fade to
    zero — i.e. zero-constant border padding.
    """
    i = jax.lax.broadcasted_iota(jnp.float32, (out_size, 1), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (1, src_size), 1)
    s = jnp.asarray(start, jnp.float32) + (i + 0.5) * jnp.asarray(scale, jnp.float32) - 0.5
    w = jnp.maximum(0.0, 1.0 - jnp.abs(s - j))
    return w.astype(dtype)


def fold_half_res(m: jnp.ndarray) -> jnp.ndarray:
    """Fold a full-resolution sampling matrix to act on a 2x-subsampled
    plane under *block-replicate* upsampling.

    NV12 chroma is stored at half resolution and the reference upsamples it
    by replication: ``u_full[r, c] = U[r//2, c//2]``
    (nv12_convert.rs:111-113).  Resampling the replicated plane with ``M``
    equals resampling the half-res plane with ``M'[i, j] = M[i, 2j] +
    M[i, 2j+1]`` — so the chroma path needs no explicit upsample at all.
    Requires an even source size.
    """
    out, src = m.shape
    assert src % 2 == 0, "fold_half_res requires even source size"
    return m.reshape(out, src // 2, 2).sum(axis=-1)


def crop_resize(img: jnp.ndarray, start_yx, size_yx, out_hw,
                dtype=jnp.float32) -> jnp.ndarray:
    """Crop window ``[start, start+size)`` from ``img`` and resize to
    ``out_hw`` with bilinear filtering and zero padding.

    ``img``: (H, W) or (H, W, C), any numeric dtype.  ``start_yx`` and
    ``size_yx`` may be traced scalars (y, x order).  Returns float
    (out_h, out_w[, C]).
    """
    out_h, out_w = out_hw
    h, w = img.shape[0], img.shape[1]
    sy, sx = start_yx
    zy, zx = size_yx
    ry = sampling_matrix(out_h, h, sy, jnp.asarray(zy, jnp.float32) / out_h, dtype)
    cx = sampling_matrix(out_w, w, sx, jnp.asarray(zx, jnp.float32) / out_w, dtype)
    imgf = img.astype(dtype)
    if img.ndim == 2:
        return ry @ imgf @ cx.T
    # (H, W, C): contract H then W, channels ride along.
    tmp = jnp.einsum("oh,hwc->owc", ry, imgf, preferred_element_type=dtype)
    return jnp.einsum("pw,owc->opc", cx, tmp, preferred_element_type=dtype)


def crop_resize_chw(img_chw: jnp.ndarray, start_yx, size_yx, out_hw,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Like :func:`crop_resize` but for channel-first (C, H, W) images,
    returning (C, out_h, out_w)."""
    out_h, out_w = out_hw
    _, h, w = img_chw.shape
    sy, sx = start_yx
    zy, zx = size_yx
    ry = sampling_matrix(out_h, h, sy, jnp.asarray(zy, jnp.float32) / out_h, dtype)
    cx = sampling_matrix(out_w, w, sx, jnp.asarray(zx, jnp.float32) / out_w, dtype)
    imgf = img_chw.astype(dtype)
    tmp = jnp.einsum("oh,chw->cow", ry, imgf, preferred_element_type=dtype)
    return jnp.einsum("pw,cow->cop", cx, tmp, preferred_element_type=dtype)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_static(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Full-frame resize with static geometry — the device-side replacement
    for the reference's RGA hardware upscale (640x512 -> 1280x1024,
    pipeline_ir.rs:62-73).  uint8 in, uint8 out."""
    h, w = img.shape[0], img.shape[1]
    out = crop_resize(img, (0.0, 0.0), (float(h), float(w)), (out_h, out_w))
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
