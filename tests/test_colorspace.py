"""Golden tests for BT.601 conversion vs an independent numpy port of the
reference integer math (/root/reference/src/nv12_convert.rs:24-43,107-168)."""

import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.ops import colorspace


def ref_convert(y, u, v):
    """Numpy port of the reference LUT math (int32, arithmetic >>8, clamp)."""
    y = y.astype(np.int64)
    u = u.astype(np.int64)
    v = v.astype(np.int64)
    yv = 298 * (y - 16)
    r = (yv + 409 * (v - 128) + 128) >> 8
    g = (yv - 100 * (u - 128) - 208 * (v - 128) + 128) >> 8
    b = (yv + 516 * (u - 128) + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def ref_nv12_to_rgb(buf, width, height):
    """Port of nv12_full_to_rgb_parallel semantics (flat UV addressing)."""
    y_size = width * height
    if len(buf) < y_size * 3 // 2:
        return np.zeros((height, width, 3), np.uint8)
    y = buf[:y_size].reshape(height, width)
    uv = buf[y_size:]
    rows = np.arange(height)[:, None]
    cols = np.arange(width)[None, :]
    base = (rows // 2) * width + (cols // 2) * 2
    base = np.minimum(base, len(uv) - 2)  # clamp tail like the jnp gather
    u = uv[base]
    v = uv[base + 1]
    return ref_convert(y, u, v)


@pytest.mark.parametrize("width,height", [(64, 48), (640, 512), (130, 34)])
def test_nv12_even_sizes_bit_exact(rng, width, height):
    buf = rng.integers(0, 256, size=width * height * 3 // 2, dtype=np.uint8)
    got = np.asarray(colorspace.nv12_to_rgb(buf, width=width, height=height))
    want = ref_nv12_to_rgb(buf, width, height)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("width,height", [(65, 48), (64, 49), (33, 27)])
def test_nv12_odd_sizes_bit_exact(rng, width, height):
    n = width * height * 3 // 2 + width  # headroom for the odd-tail reads
    buf = rng.integers(0, 256, size=n, dtype=np.uint8)
    got = np.asarray(colorspace.nv12_to_rgb(buf, width=width, height=height))
    want = ref_nv12_to_rgb(buf, width, height)
    np.testing.assert_array_equal(got, want)


def test_nv12_short_buffer_returns_zeros():
    # Mirrors nv12_convert.rs:48-50.
    buf = np.full(10, 200, np.uint8)
    got = np.asarray(colorspace.nv12_to_rgb(buf, width=64, height=48))
    assert got.shape == (48, 64, 3)
    assert got.sum() == 0


def test_nv12_planes_matches_flat(rng):
    w, h = 128, 96
    buf = rng.integers(0, 256, size=w * h * 3 // 2, dtype=np.uint8)
    y = buf[: w * h].reshape(h, w)
    uv = buf[w * h:].reshape(h // 2, w // 2, 2)
    got = np.asarray(colorspace.nv12_planes_to_rgb(y, uv))
    want = np.asarray(colorspace.nv12_to_rgb(buf, width=w, height=h))
    np.testing.assert_array_equal(got, want)


def test_yuy2_matches_reference_math(rng):
    w, h = 64, 32
    buf = rng.integers(0, 256, size=w * h * 2, dtype=np.uint8)
    got = np.asarray(colorspace.yuy2_to_rgb(buf, width=w, height=h))
    quad = buf.reshape(h, w // 2, 4)
    y = quad[..., (0, 2)].reshape(h, w)
    u = np.repeat(quad[..., 1], 2, axis=1)
    v = np.repeat(quad[..., 3], 2, axis=1)
    np.testing.assert_array_equal(got, ref_convert(y, u, v))


def test_known_values():
    # Black level (Y=16, U=V=128) -> 0; white (Y=235) -> 255.
    y = np.array([[16, 235]], np.uint8)
    u = np.array([[128, 128]], np.uint8)
    v = np.array([[128, 128]], np.uint8)
    out = ref_convert(y, u, v)
    np.testing.assert_array_equal(out[0, 0], [0, 0, 0])
    np.testing.assert_array_equal(out[0, 1], [255, 255, 255])
