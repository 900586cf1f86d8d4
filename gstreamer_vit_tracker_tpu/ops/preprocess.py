"""Fused crop + resize + colorspace + normalize preprocess.

This is the TPU-native replacement for two reference components at once
(SURVEY.md §2, "native components" items 1-2):

* the CPU NV12->RGB converter ``nv12_full_to_rgb_parallel``
  (/root/reference/src/nv12_convert.rs:46-92), which the legacy pipeline ran
  over the *entire* 1080p frame every frame only to feed a small tracker
  crop (pipeline.rs:104-106);
* the OpenCV crop/resize/normalize inside the external ``vit_tracker``
  crate (SURVEY.md §2.9).

Here the whole chain — chroma-folded bilinear window resampling, BT.601
conversion, and model normalisation — is one linear+elementwise program over
the HBM-resident frame.  Only the pixels the sampling matrices touch are
ever converted; nothing round-trips to the host.  The resampling runs as
MXU matmuls (see ops/resample.py); XLA fuses the conversion and
normalisation into the matmul epilogue.

Crop geometry follows the OSTrack/VitTrack convention used by the OpenCV
Zoo ``object_tracking_vittrack_2023sep`` model the reference loads
(main.rs:25): a square window of side ``ceil(factor * sqrt(w*h))`` centred
on the target, zero-padded where it leaves the frame, resized to the model
input size.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .colorspace import rgb_from_shifted_yuv_f32
from .resample import fold_half_res, sampling_matrix

__all__ = ["CropWindow", "crop_window", "preprocess_rgb", "preprocess_nv12",
           "preprocess_yuy2", "normalize"]


# ---------------------------------------------------------------------------
# Patch-major output (fused preprocess + patch-embed, zero data relayout)
# ---------------------------------------------------------------------------
# Feeding a ViT patch embed from a (S, S, 3) crop needs the pixels grouped
# as (gh, gw, p, q, c) — a 6-D transpose whose HBM relayout dominated the
# embed stage (~0.015 ms of a ~0.09 ms step; docs/ARCHITECTURE.md).  But the
# crop's ROW order is ours to choose: permuting the *sampling matrix* rows
# to patch-major order r = p*g + gh (free — the matrix is generated from
# iota at trace time, XLA folds the permutation into the generation) makes
# the resample matmuls emit the crop as (p, gh, x, c), which reshapes — all
# groupings contiguous, no relayout — to (p, (gh, gw), (q, c)).  The patch
# embed then runs as a p-batched matmul summed over p (models/vit.py::
# embed_search_patches) instead of transpose + one big matmul.


def _patch_row_perm(m: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Permute a (out, src) sampling matrix's output rows from raster order
    y = gh*patch + p to patch-major order r = p*(out//patch) + gh."""
    out, src = m.shape
    g = out // patch
    return m.reshape(g, patch, src).transpose(1, 0, 2).reshape(out, src)


def _to_patches(crop: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(out, out, 3) crop whose rows are patch-major -> (patch, N, patch*3)
    patch pixels, via a single contiguous reshape."""
    out = crop.shape[1]
    g = out // patch
    return crop.reshape(patch, g * g, patch * 3)


class CropWindow(NamedTuple):
    """Square sampling window in source-frame pixels."""

    cx: jnp.ndarray      # window centre x
    cy: jnp.ndarray      # window centre y
    size: jnp.ndarray    # window side length (source px)


def crop_window(bbox: jnp.ndarray, factor: float) -> CropWindow:
    """Window around ``bbox`` = (x, y, w, h) with ``factor`` x context.

    ``side = ceil(factor * sqrt(w * h))`` — the OSTrack ``sample_target``
    convention; w/h are floored at 1px so a degenerate box still yields a
    valid window.
    """
    x, y, w, h = bbox[0], bbox[1], bbox[2], bbox[3]
    w = jnp.maximum(w, 1.0)
    h = jnp.maximum(h, 1.0)
    cx = x + 0.5 * w
    cy = y + 0.5 * h
    size = jnp.ceil(factor * jnp.sqrt(w * h))
    return CropWindow(cx=cx, cy=cy, size=jnp.maximum(size, 2.0))


def normalize(rgb01: jnp.ndarray, mean: Sequence[float],
              std: Sequence[float]) -> jnp.ndarray:
    """Channel-wise ``(x - mean) / std`` on a (..., 3) image in [0, 1]."""
    m = jnp.asarray(mean, rgb01.dtype)
    s = jnp.asarray(std, rgb01.dtype)
    return (rgb01 - m) / s


def band_origin(window: CropWindow, frame_h: int, frame_w: int,
                band: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-left corner (row0, col0) of a static ``band`` x ``band`` region
    centred on the crop window, clamped inside the frame and snapped to
    even coordinates (NV12 chroma alignment).

    Banding bounds the resample matmuls by the band size instead of the
    frame size: for a typical search window (a few hundred px) on
    1080p/4K frames most of the frame-sized matrix work is multiplying
    zero weights.  Windows larger than the band degrade gracefully — the
    out-of-band fringe samples as zero padding.
    """
    def origin(centre, limit):
        o = jnp.round(centre - band / 2).astype(jnp.int32)
        o = jnp.clip(o, 0, max(limit - band, 0))
        return (o // 2) * 2

    return origin(window.cy, frame_h), origin(window.cx, frame_w)


def preprocess_rgb(rgb: jnp.ndarray, window: CropWindow, out_size: int,
                   mean: Sequence[float], std: Sequence[float],
                   dtype=jnp.float32,
                   band: Optional[int] = None,
                   patch_major: Optional[int] = None) -> jnp.ndarray:
    """Crop ``window`` from an (H, W, 3) uint8 RGB frame, resize to
    ``out_size`` square, scale to [0,1] and normalise.  Returns float
    (out_size, out_size, 3).

    ``patch_major=p`` instead returns (p, (out//p)^2, p*3) patch pixels in
    ViT patch-embed order (see the patch-major note above) — numerically
    identical values, rows produced pre-permuted so no relayout is needed.
    """
    h, w = rgb.shape[0], rgb.shape[1]
    start_y = window.cy - 0.5 * window.size
    start_x = window.cx - 0.5 * window.size
    if band is not None and (h > band or w > band):
        bh, bw = min(band, h), min(band, w)
        row0, col0 = band_origin(window, h, w, band)
        rgb = jax.lax.dynamic_slice(rgb, (row0, col0, 0), (bh, bw, 3))
        start_y = start_y - row0
        start_x = start_x - col0
        h, w = bh, bw
    scale = window.size / out_size
    ry = sampling_matrix(out_size, h, start_y, scale, dtype)
    if patch_major is not None:
        ry = _patch_row_perm(ry, patch_major)
    cx = sampling_matrix(out_size, w, start_x, scale, dtype)
    imgf = rgb.astype(dtype)
    tmp = jnp.einsum("oh,hwc->owc", ry, imgf, preferred_element_type=dtype)
    crop = jnp.einsum("pw,owc->opc", cx, tmp, preferred_element_type=dtype)
    crop = normalize(crop / 255.0, mean, std)
    return _to_patches(crop, patch_major) if patch_major is not None else crop


def preprocess_nv12(y_plane: jnp.ndarray, uv_plane: jnp.ndarray,
                    window: CropWindow, out_size: int,
                    mean: Sequence[float], std: Sequence[float],
                    dtype=jnp.float32,
                    band: Optional[int] = None,
                    patch_major: Optional[int] = None) -> jnp.ndarray:
    """Fused NV12 -> normalised RGB model crop.

    ``y_plane``: (H, W) uint8;  ``uv_plane``: (H//2, W//2, 2) uint8 with
    channel 0 = U, 1 = V (even H, W — the production frame layout).

    Luma is resampled at full resolution; chroma is resampled directly at
    half resolution through the pair-folded matrices (exactly equivalent to
    the reference's block-replicate upsample followed by the same bilinear
    resample — see :func:`ops.resample.fold_half_res`).  The black-level
    offsets (Y-16, U-128, V-128) are subtracted *before* resampling so the
    zero-weight padding region decodes to black; BT.601 conversion and
    normalisation happen in float on the resampled planes.  No intermediate
    full-frame RGB image ever exists.
    """
    h, w = y_plane.shape
    start_y = window.cy - 0.5 * window.size
    start_x = window.cx - 0.5 * window.size
    if band is not None and (h > band or w > band):
        bh, bw = min(band, h), min(band, w)
        row0, col0 = band_origin(window, h, w, band)
        y_plane = jax.lax.dynamic_slice(y_plane, (row0, col0), (bh, bw))
        uv_plane = jax.lax.dynamic_slice(uv_plane, (row0 // 2, col0 // 2, 0),
                                         (bh // 2, bw // 2, 2))
        start_y = start_y - row0
        start_x = start_x - col0
        h, w = bh, bw

    scale = window.size / out_size
    ry = sampling_matrix(out_size, h, start_y, scale, dtype)
    if patch_major is not None:
        ry = _patch_row_perm(ry, patch_major)
    cxm = sampling_matrix(out_size, w, start_x, scale, dtype)
    ry_uv = fold_half_res(ry)
    cx_uv = fold_half_res(cxm)

    yc = ry @ (y_plane.astype(dtype) - 16.0) @ cxm.T
    uc = ry_uv @ (uv_plane[..., 0].astype(dtype) - 128.0) @ cx_uv.T
    vc = ry_uv @ (uv_plane[..., 1].astype(dtype) - 128.0) @ cx_uv.T

    rgb = rgb_from_shifted_yuv_f32(yc, uc, vc)
    rgb = jnp.clip(rgb, 0.0, 255.0)
    rgb = normalize(rgb / 255.0, mean, std)
    return _to_patches(rgb, patch_major) if patch_major is not None else rgb


def preprocess_yuy2(yuy2: jnp.ndarray, window: CropWindow, out_size: int,
                    mean: Sequence[float], std: Sequence[float],
                    dtype=jnp.float32,
                    band: Optional[int] = None,
                    patch_major: Optional[int] = None) -> jnp.ndarray:
    """Fused YUY2 -> normalised RGB model crop.

    YUY2 is the active reference camera format (4:2:2 packed, two pixels
    per Y0-U-Y1-V quad; pipeline_ir.rs:36-41).  ``yuy2`` is the row-major
    packed buffer shaped (H, W*2) uint8.  Luma resamples at full
    resolution; chroma (full vertical, half horizontal resolution)
    resamples through the column-folded matrix only — the 4:2:2 analog of
    the NV12 path.  ``band`` slices a static window-centred region first
    (even-column aligned for the 4:2:2 chroma fold), like the RGB/NV12
    paths, so large frames pay band-sized rather than frame-sized matmuls.
    """
    height = yuy2.shape[0]
    width = yuy2.shape[1] // 2
    start_y = window.cy - 0.5 * window.size
    start_x = window.cx - 0.5 * window.size
    if band is not None and (height > band or width > band):
        bh, bw = min(band, height), min(band, width)
        row0, col0 = band_origin(window, height, width, band)
        # Slice the packed buffer: one output column = two packed bytes;
        # col0 is even so the quad phase (Y0 U Y1 V) is preserved.
        yuy2 = jax.lax.dynamic_slice(yuy2, (row0, col0 * 2), (bh, bw * 2))
        start_y = start_y - row0
        start_x = start_x - col0
        height, width = bh, bw
    quads = yuy2.reshape(height, width // 2, 4)
    y_plane = quads[..., (0, 2)].reshape(height, width)
    u_half = quads[..., 1]           # (H, W/2)
    v_half = quads[..., 3]

    scale = window.size / out_size
    ry = sampling_matrix(out_size, height, start_y, scale, dtype)
    if patch_major is not None:
        ry = _patch_row_perm(ry, patch_major)
    cxm = sampling_matrix(out_size, width, start_x, scale, dtype)
    cx_uv = fold_half_res(cxm)

    yc = ry @ (y_plane.astype(dtype) - 16.0) @ cxm.T
    uc = ry @ (u_half.astype(dtype) - 128.0) @ cx_uv.T
    vc = ry @ (v_half.astype(dtype) - 128.0) @ cx_uv.T

    rgb = rgb_from_shifted_yuv_f32(yc, uc, vc)
    rgb = jnp.clip(rgb, 0.0, 255.0)
    rgb = normalize(rgb / 255.0, mean, std)
    return _to_patches(rgb, patch_major) if patch_major is not None else rgb
