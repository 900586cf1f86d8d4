"""Tests for the matmul resampler and the fused NV12 preprocess."""

import jax.numpy as jnp
import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.ops import colorspace, preprocess, resample


def bilinear_ref(img, start_y, start_x, size_y, size_x, out_h, out_w):
    """Direct (slow) bilinear crop-resize with zero border, half-pixel
    centers — independent reference for the matmul formulation."""
    img = img.astype(np.float64)
    h, w = img.shape[:2]
    out = np.zeros((out_h, out_w) + img.shape[2:], np.float64)
    for i in range(out_h):
        sy = start_y + (i + 0.5) * (size_y / out_h) - 0.5
        y0 = int(np.floor(sy))
        fy = sy - y0
        for j in range(out_w):
            sx = start_x + (j + 0.5) * (size_x / out_w) - 0.5
            x0 = int(np.floor(sx))
            fx = sx - x0

            def px(yy, xx):
                if 0 <= yy < h and 0 <= xx < w:
                    return img[yy, xx]
                return np.zeros(img.shape[2:]) if img.ndim == 3 else 0.0

            out[i, j] = ((1 - fy) * (1 - fx) * px(y0, x0)
                         + (1 - fy) * fx * px(y0, x0 + 1)
                         + fy * (1 - fx) * px(y0 + 1, x0)
                         + fy * fx * px(y0 + 1, x0 + 1))
    return out


def test_sampling_matrix_rows_sum_to_one_inside():
    m = np.asarray(resample.sampling_matrix(8, 32, 4.0, 2.0))
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_sampling_matrix_zero_outside():
    # Window entirely left of the frame -> all-zero rows (zero padding).
    m = np.asarray(resample.sampling_matrix(4, 32, -100.0, 1.0))
    assert np.all(m == 0)


def test_identity_resample(rng):
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    out = np.asarray(resample.crop_resize(jnp.asarray(img), (0.0, 0.0),
                                          (16.0, 24.0), (16, 24)))
    np.testing.assert_allclose(out, img.astype(np.float32), atol=1e-3)


@pytest.mark.parametrize("start,size,out", [
    ((2.0, 3.0), (10.0, 12.0), (5, 6)),
    ((-4.0, -4.0), (20.0, 20.0), (8, 8)),     # window hangs off the frame
    ((7.5, 1.25), (6.5, 9.75), (16, 4)),      # fractional geometry
])
def test_crop_resize_matches_direct_bilinear(rng, start, size, out):
    img = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    got = np.asarray(resample.crop_resize(jnp.asarray(img), start, size, out))
    want = bilinear_ref(img, start[0], start[1], size[0], size[1], out[0], out[1])
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_crop_resize_multichannel(rng):
    img = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
    got = np.asarray(resample.crop_resize(jnp.asarray(img), (1.0, 2.0),
                                          (8.0, 8.0), (4, 4)))
    want = bilinear_ref(img, 1.0, 2.0, 8.0, 8.0, 4, 4)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_resize_static_upscale(rng):
    img = rng.integers(0, 256, size=(8, 10, 3), dtype=np.uint8)
    out = np.asarray(resample.resize_static(jnp.asarray(img), 16, 20))
    assert out.shape == (16, 20, 3)
    assert out.dtype == np.uint8
    # 2x bilinear upscale keeps half-pixel-aligned source values.
    want = bilinear_ref(img, 0, 0, 8, 10, 16, 20)
    np.testing.assert_allclose(out.astype(np.float64), want, atol=1.0)


def test_fold_half_res_equals_replicate_then_resample(rng):
    half = rng.integers(0, 256, size=(8, 8), dtype=np.uint8).astype(np.float32)
    full = np.repeat(np.repeat(half, 2, axis=0), 2, axis=1)
    m = resample.sampling_matrix(6, 16, 1.3, 1.7)
    direct = np.asarray(m @ jnp.asarray(full) @ m.T)
    folded = resample.fold_half_res(m)
    via_fold = np.asarray(folded @ jnp.asarray(half) @ folded.T)
    np.testing.assert_allclose(via_fold, direct, atol=1e-3)


def test_crop_window_geometry():
    w = preprocess.crop_window(jnp.asarray([10.0, 20.0, 30.0, 40.0]), 2.0)
    assert float(w.cx) == 25.0
    assert float(w.cy) == 40.0
    assert float(w.size) == float(np.ceil(2.0 * np.sqrt(30.0 * 40.0)))


def rgb_to_nv12(rgb):
    """Forward BT.601 limited-range RGB->NV12 (test helper; produces
    in-gamut YUV so neither path's clamp is active)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 16 + (65.738 * r + 129.057 * g + 25.064 * b) / 256
    u = 128 + (-37.945 * r - 74.494 * g + 112.439 * b) / 256
    v = 128 + (112.439 * r - 94.154 * g - 18.285 * b) / 256
    y = np.clip(np.round(y), 16, 235).astype(np.uint8)
    u = np.clip(np.round(u[0::2, 0::2]), 16, 240).astype(np.uint8)
    v = np.clip(np.round(v[0::2, 0::2]), 16, 240).astype(np.uint8)
    return y, np.stack([u, v], axis=-1).astype(np.uint8)


def test_preprocess_nv12_matches_unfused(rng):
    """Fused NV12 preprocess == (exact convert -> float crop-resize ->
    normalize) on in-gamut frames, up to integer rounding."""
    h, w = 64, 96
    # Smooth field: per-pixel random chroma would alias through the 4:2:0
    # subsampling and trip the integer path's gamut clamp.
    coarse = rng.integers(30, 226, size=(8, 12, 3)).astype(np.float64)
    rgb_src = np.clip(np.round(np.asarray(
        resample.crop_resize(jnp.asarray(coarse), (0.0, 0.0), (8.0, 12.0), (h, w))
    )), 0, 255).astype(np.uint8)
    y_np, uv_np = rgb_to_nv12(rgb_src)
    y = jnp.asarray(y_np)
    uv = jnp.asarray(uv_np)
    bbox = jnp.asarray([30.0, 20.0, 16.0, 12.0])
    win = preprocess.crop_window(bbox, 2.0)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    fused = np.asarray(preprocess.preprocess_nv12(y, uv, win, 32, mean, std))

    rgb = colorspace.nv12_planes_to_rgb(y, uv)
    start = (float(win.cy) - float(win.size) / 2, float(win.cx) - float(win.size) / 2)
    crop = resample.crop_resize(rgb, start, (float(win.size), float(win.size)), (32, 32))
    unfused = np.asarray(preprocess.normalize(jnp.clip(crop, 0, 255) / 255.0, mean, std))

    # Integer rounding in the unfused path bounds the difference by ~1 LSB
    # per channel after normalisation.
    np.testing.assert_allclose(fused, unfused, atol=2.5 / 255 / 0.2)


def test_preprocess_rgb_shape_and_norm(rng):
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    win = preprocess.crop_window(jnp.asarray([10.0, 10.0, 20.0, 20.0]), 4.0)
    out = np.asarray(preprocess.preprocess_rgb(jnp.asarray(img), win, 16,
                                               (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)))
    assert out.shape == (16, 16, 3)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_banded_preprocess_matches_unbanded(rng):
    """Banding is a pure FLOP optimisation: when the window fits inside the
    band the result must match the full-frame computation."""
    import jax.numpy as jnp

    from gstreamer_vit_tracker_tpu.ops import preprocess as pp

    h, w = 256, 384
    coarse = rng.integers(30, 226, size=(8, 12, 3)).astype(np.float64)
    rgb_src = np.clip(np.round(np.asarray(
        resample.crop_resize(jnp.asarray(coarse), (0.0, 0.0), (8.0, 12.0), (h, w))
    )), 0, 255).astype(np.uint8)
    y_np, uv_np = rgb_to_nv12(rgb_src)
    y, uv = jnp.asarray(y_np), jnp.asarray(uv_np)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    for bbox in [(180.0, 120.0, 40.0, 30.0),   # interior
                 (4.0, 4.0, 30.0, 30.0),        # near corner (band clamps)
                 (350.0, 230.0, 24.0, 24.0)]:   # near far edge
        win = pp.crop_window(jnp.asarray(bbox), 4.0)
        full = np.asarray(pp.preprocess_nv12(y, uv, win, 64, mean, std))
        banded = np.asarray(pp.preprocess_nv12(y, uv, win, 64, mean, std,
                                               band=192))
        np.testing.assert_allclose(banded, full, atol=1e-4, err_msg=str(bbox))

        full_rgb = np.asarray(pp.preprocess_rgb(jnp.asarray(rgb_src), win, 64,
                                                mean, std))
        banded_rgb = np.asarray(pp.preprocess_rgb(jnp.asarray(rgb_src), win,
                                                  64, mean, std, band=192))
        np.testing.assert_allclose(banded_rgb, full_rgb, atol=1e-4)


def test_banded_yuy2_matches_unbanded(rng):
    """YUY2 path banding parity (ADVICE round 1: the band parameter was
    silently dropped on the YUY2 path): band-sliced result must equal the
    full-frame computation, including odd-window/near-edge geometry where
    the even-column snap matters for the 4:2:2 chroma fold."""
    from gstreamer_vit_tracker_tpu.media.source import rgb_to_yuy2
    from gstreamer_vit_tracker_tpu.ops import preprocess as pp

    h, w = 256, 384
    coarse = rng.integers(30, 226, size=(8, 12, 3)).astype(np.float64)
    rgb_src = np.clip(np.round(np.asarray(
        resample.crop_resize(jnp.asarray(coarse), (0.0, 0.0), (8.0, 12.0),
                             (h, w))
    )), 0, 255).astype(np.uint8)
    yuy2 = jnp.asarray(rgb_to_yuy2(rgb_src))
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    for bbox in [(180.0, 120.0, 40.0, 30.0),   # interior
                 (3.0, 5.0, 31.0, 29.0),        # near corner, odd sizes
                 (350.0, 230.0, 24.0, 24.0)]:   # near far edge
        win = pp.crop_window(jnp.asarray(bbox), 4.0)
        full = np.asarray(pp.preprocess_yuy2(yuy2, win, 64, mean, std))
        banded = np.asarray(pp.preprocess_yuy2(yuy2, win, 64, mean, std,
                                               band=192))
        np.testing.assert_allclose(banded, full, atol=1e-4, err_msg=str(bbox))
