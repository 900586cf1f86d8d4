"""BT.601 limited-range YUV -> RGB colorspace conversion, TPU-native.

Re-implements (bit-exactly) the integer LUT math of the reference CPU kernel
``nv12_full_to_rgb_parallel`` (/root/reference/src/nv12_convert.rs:8-43,
107-168):

    y' = 298 * (Y - 16)
    R  = clamp_u8((y' + 409*(V-128)            + 128) >> 8)
    G  = clamp_u8((y' - 100*(U-128) - 208*(V-128) + 128) >> 8)
    B  = clamp_u8((y' + 516*(U-128)            + 128) >> 8)

The reference parallelises over row pairs with rayon on 8 CPU threads; on
TPU the whole frame is one vectorised XLA program (SURVEY.md §2 "native
components" item 2).  Integer ops map onto the VPU; there is no LUT — the
affine form is cheaper than a gather on this hardware.

Also provides YUY2 -> RGB (the active reference pipeline's camera format,
pipeline_ir.rs:36-41, where the conversion is done by GStreamer's
``videoconvert``) using the same BT.601 math, plus float-space coefficient
helpers used by the fused crop/resize/normalize preprocess kernel
(ops/preprocess.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "nv12_to_rgb",
    "nv12_planes_to_rgb",
    "yuy2_to_rgb",
    "BT601_COEFFS",
    "rgb_from_yuv_f32",
]

# Float-space BT.601 coefficients: the integer math divided by 256.
# R = 298/256*(Y-16) + 409/256*(V-128), etc.
BT601_COEFFS = {
    "y": 298.0 / 256.0,
    "rv": 409.0 / 256.0,
    "gu": -100.0 / 256.0,
    "gv": -208.0 / 256.0,
    "bu": 516.0 / 256.0,
}


def _convert_i32(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Exact integer BT.601 conversion; inputs int32 (H, W), output uint8
    (H, W, 3).  Matches nv12_convert.rs:124-126 including the ``+128 >> 8``
    rounding and clamp (arithmetic shift on negatives, as Rust i32 ``>>``)."""
    yv = 298 * (y - 16)
    rv = 409 * (v - 128)
    gu = 100 * (u - 128)
    gv = 208 * (v - 128)
    bu = 516 * (u - 128)
    r = jnp.right_shift(yv + rv + 128, 8)
    g = jnp.right_shift(yv - gu - gv + 128, 8)
    b = jnp.right_shift(yv + bu + 128, 8)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def nv12_to_rgb(nv12: jnp.ndarray, *, width: int, height: int) -> jnp.ndarray:
    """Convert a flat NV12 byte buffer to an RGB image.

    ``nv12`` is a 1-D uint8 buffer: Y plane (height*width bytes) followed by
    the interleaved UV plane.  Semantics mirror the reference exactly:

    * a buffer shorter than ``width*height*3//2`` yields a zero image
      (nv12_convert.rs:48-50);
    * pixel (r, c) reads U at flat UV offset ``(r//2)*width + (c//2)*2`` and
      V at the next byte (nv12_convert.rs:111-113, 152-154) — well-defined
      for odd sizes too.
    """
    y_size = width * height
    required = y_size * 3 // 2

    def short(_):
        return jnp.zeros((height, width, 3), jnp.uint8)

    def ok(buf):
        y = buf[:y_size].reshape(height, width).astype(jnp.int32)
        uv = buf[y_size:]
        # Flat-index gather reproducing the reference addressing for any
        # parity of width/height (out-of-range tail reads clamp, where the
        # reference's unchecked access would be UB).
        rows = jnp.arange(height, dtype=jnp.int32)[:, None]
        cols = jnp.arange(width, dtype=jnp.int32)[None, :]
        base = (rows // 2) * width + (cols // 2) * 2
        u = uv[base].astype(jnp.int32)
        v = uv[base + 1].astype(jnp.int32)
        return _convert_i32(y, u, v)

    def ok_even(buf):
        # Fast path for even dimensions: pure reshape/repeat, no gather.
        y = buf[:y_size].reshape(height, width).astype(jnp.int32)
        uv = buf[y_size:y_size + y_size // 2].reshape(height // 2, width // 2, 2)
        u = jnp.repeat(jnp.repeat(uv[..., 0], 2, axis=0), 2, axis=1).astype(jnp.int32)
        v = jnp.repeat(jnp.repeat(uv[..., 1], 2, axis=0), 2, axis=1).astype(jnp.int32)
        return _convert_i32(y, u, v)

    if nv12.shape[0] < required:
        return short(nv12)
    if width % 2 == 0 and height % 2 == 0:
        return ok_even(nv12)
    return ok(nv12)


@jax.jit
def nv12_planes_to_rgb(y_plane: jnp.ndarray, uv_plane: jnp.ndarray) -> jnp.ndarray:
    """Planar variant: ``y_plane`` (H, W) uint8, ``uv_plane`` (H//2, W//2, 2)
    uint8 with channel 0 = U, 1 = V.  Even dimensions only (the HBM-resident
    hot-path layout for 1080p streams)."""
    h, w = y_plane.shape
    y = y_plane.astype(jnp.int32)
    u = jnp.repeat(jnp.repeat(uv_plane[..., 0], 2, axis=0), 2, axis=1).astype(jnp.int32)
    v = jnp.repeat(jnp.repeat(uv_plane[..., 1], 2, axis=0), 2, axis=1).astype(jnp.int32)
    return _convert_i32(y, u, v)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def yuy2_to_rgb(yuy2: jnp.ndarray, *, width: int, height: int) -> jnp.ndarray:
    """Convert a flat YUY2 (YUYV) buffer to RGB.

    YUY2 packs two pixels into 4 bytes: Y0 U Y1 V.  The reference's active
    pipeline captures YUY2 640x512 (pipeline_ir.rs:36-41) and converts with
    GStreamer ``videoconvert``; we use the same BT.601 integer math as the
    NV12 path so both camera formats share one colour definition.  Width
    must be even (as every YUY2 source is).
    """
    assert width % 2 == 0, "YUY2 requires even width"
    quad = yuy2[: height * width * 2].reshape(height, width // 2, 4).astype(jnp.int32)
    y = quad[..., (0, 2)].reshape(height, width)
    u = jnp.repeat(quad[..., 1], 2, axis=1)
    v = jnp.repeat(quad[..., 3], 2, axis=1)
    return _convert_i32(y, u, v)


def rgb_from_yuv_f32(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Float-space BT.601 conversion (no rounding/clamp), used inside the
    fused preprocess where conversion composes with resampling and
    normalisation into one linear map.  Returns float32 stacked RGB with the
    channel axis last."""
    return rgb_from_shifted_yuv_f32(y - 16.0, u - 128.0, v - 128.0)


def rgb_from_shifted_yuv_f32(yp: jnp.ndarray, up: jnp.ndarray,
                             vp: jnp.ndarray) -> jnp.ndarray:
    """BT.601 conversion of *offset-shifted* planes (Y-16, U-128, V-128).

    The fused preprocess subtracts the black-level offsets before
    resampling so that zero-weight (out-of-window) samples decode to black
    rather than to the green-tinted colour that raw YUV(0,0,0) would give.
    Conversion of shifted planes is purely linear, so it commutes with the
    bilinear resampling matmuls.
    """
    c = BT601_COEFFS
    yv = c["y"] * yp
    r = yv + c["rv"] * vp
    g = yv + c["gu"] * up + c["gv"] * vp
    b = yv + c["bu"] * up
    return jnp.stack([r, g, b], axis=-1)
