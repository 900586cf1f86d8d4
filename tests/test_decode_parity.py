"""Decode-semantics parity vs an INDEPENDENT port of OpenCV's TrackerVit.

The reference's tracker behavior is defined by OpenCV Zoo's
``object_tracking_vittrack_2023sep`` model (/root/reference/src/main.rs:25)
running OpenCV's TrackerVit postprocess.  The model file itself cannot be
fetched (zero egress), but the *decode* — hanning-window application,
argmax, offset/size readout, score calibration — and the crop geometry are
fully specified by OpenCV's implementation.  This file re-implements that
postprocess in plain numpy, written from the OpenCV documentation and NOT
from models/heads.py, and pins:

1. ``hanning_2d(fs, "opencv")`` bit-for-bit against cv2.createHanningWindow;
2. ``decode_maps`` against the independent numpy postprocess on random maps;
3. the crop/resize geometry against cv2.resize (half-pixel centres);
4. the normalisation constants against cv2.TrackerVit_Params defaults.

A deviation in any decode semantic from the real VitTrack family fails
here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.models import heads
from gstreamer_vit_tracker_tpu.ops import preprocess as pp

cv2 = pytest.importorskip("cv2")


# ---------------------------------------------------------------------------
# Independent numpy port of the OpenCV TrackerVit postprocess
# ---------------------------------------------------------------------------

def port_hanning(fs: int) -> np.ndarray:
    """cv2.createHanningWindow formula (phasecorr.cpp):
    ``dst(i,j) = sqrt(0.5*(1-cos(2*pi*i/(N-1))) * 0.5*(1-cos(2*pi*j/(N-1))))``
    = ``sin(pi*i/(N-1)) * sin(pi*j/(N-1))`` — root-Hann outer product,
    zero at the borders."""
    i = np.arange(fs, dtype=np.float64)
    w = np.sin(np.pi * i / (fs - 1))
    return np.outer(w, w).astype(np.float32)


def port_decode(conf: np.ndarray, offset: np.ndarray, size: np.ndarray,
                hann: np.ndarray):
    """TrackerVit::update postprocess: multiply the confidence map by the
    hanning window, take the (first, row-major) argmax, read the sub-cell
    offset and normalised size at that cell.  Returns ((cx, cy, w, h) in
    crop-normalised coords, tracking score = penalised max).

    ``offset``/``size`` are (2, fs, fs) channel-first as the ONNX model
    emits them; channel 0 is x/width, channel 1 is y/height.
    """
    fs = conf.shape[0]
    penalised = conf * hann
    # cv2.minMaxLoc scans row-major and keeps the FIRST maximum.
    flat = penalised.reshape(-1)
    idx = int(np.argmax(flat))
    y, x = divmod(idx, fs)
    score = float(flat[idx])
    cx = (x + float(offset[0, y, x])) / fs
    cy = (y + float(offset[1, y, x])) / fs
    w = float(size[0, y, x])
    h = float(size[1, y, x])
    return (cx, cy, w, h), score


# ---------------------------------------------------------------------------
# 1. Hanning window
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fs", [8, 16, 20])
def test_hanning_opencv_mode_matches_cv2(fs):
    ours = np.asarray(heads.hanning_2d(fs, mode="opencv"), np.float32)
    ref = cv2.createHanningWindow((fs, fs), cv2.CV_32F)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    np.testing.assert_allclose(ours, port_hanning(fs), atol=1e-6)
    # The defining property: border rows/cols are exactly zero.
    assert ours[0].max() == 0 and ours[-1].max() == 0
    assert ours[:, 0].max() == 0 and ours[:, -1].max() == 0


# ---------------------------------------------------------------------------
# 2. decode_maps vs the independent port
# ---------------------------------------------------------------------------

def test_decode_matches_independent_port():
    fs = 16
    rng = np.random.default_rng(42)
    hann = heads.hanning_2d(fs, mode="opencv")
    for case in range(200):
        conf = rng.random((fs, fs), np.float32)
        offset_cf = rng.random((2, fs, fs), np.float32)   # channel-first
        size_cf = rng.random((2, fs, fs), np.float32) * 0.9 + 0.05
        (cx, cy, w, h), score = port_decode(conf, offset_cf, size_cf,
                                            np.asarray(hann))

        # Our maps are channel-last (fs, fs, 2) with the same x=0/y=1 order.
        bbox, conf_out = heads.decode_maps(
            jnp.asarray(conf),
            jnp.asarray(np.moveaxis(offset_cf, 0, -1)),
            jnp.asarray(np.moveaxis(size_cf, 0, -1)),
            hann, jnp.asarray([0.3, 0.3]))
        np.testing.assert_allclose(np.asarray(bbox), [cx, cy, w, h],
                                   atol=1e-6, err_msg=f"case {case}")
        np.testing.assert_allclose(float(conf_out), score, atol=1e-6)


def test_decode_tie_breaks_like_minmaxloc():
    """Equal maxima: both take the first in row-major scan order."""
    fs = 8
    conf = np.zeros((fs, fs), np.float32)
    conf[2, 5] = conf[5, 2] = 1.0     # tie; (2,5) comes first row-major
    hann = np.ones((fs, fs), np.float32)
    off = np.zeros((2, fs, fs), np.float32)
    sz = np.full((2, fs, fs), 0.2, np.float32)
    (cx, cy, _, _), _ = port_decode(conf, off, sz, hann)
    bbox, _ = heads.decode_maps(jnp.asarray(conf),
                                jnp.zeros((fs, fs, 2)),
                                jnp.full((fs, fs, 2), 0.2),
                                jnp.asarray(hann), jnp.asarray([0.2, 0.2]))
    assert (cx, cy) == (5 / fs, 2 / fs)
    np.testing.assert_allclose(np.asarray(bbox[:2]), [cx, cy], atol=1e-7)


# ---------------------------------------------------------------------------
# 3. Crop geometry: our MXU-matmul resampler vs cv2.resize
# ---------------------------------------------------------------------------

def test_crop_resize_matches_cv2_bilinear():
    """For an integer-aligned interior window, the fused preprocess must
    equal slice + cv2.resize(INTER_LINEAR) (both use half-pixel-centre
    bilinear sampling), then the documented TrackerVit normalisation."""
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (240, 320, 3), np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    out_size = 64

    # bbox chosen so the window side ceil(2*sqrt(w*h)) = 96 and the window
    # [cx-48, cx+48) is integer-aligned and fully inside the frame.
    bbox = jnp.asarray([100.0, 80.0, 48.0, 48.0])
    win = pp.crop_window(bbox, 2.0)
    side = int(np.asarray(win.size))
    assert side == 96
    y0 = int(np.asarray(win.cy)) - side // 2
    x0 = int(np.asarray(win.cx)) - side // 2

    crop = frame[y0:y0 + side, x0:x0 + side].astype(np.float32)
    ref = cv2.resize(crop, (out_size, out_size),
                     interpolation=cv2.INTER_LINEAR)
    ref = (ref / 255.0 - np.asarray(mean, np.float32)) / np.asarray(
        std, np.float32)

    ours = np.asarray(pp.preprocess_rgb(jnp.asarray(frame), win, out_size,
                                        mean, std))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_crop_window_side_is_ceil_factor_sqrt_wh():
    for w, h, f in [(33.0, 57.0, 2.0), (120.0, 80.0, 4.0), (21.0, 21.0, 2.0)]:
        win = pp.crop_window(jnp.asarray([10.0, 10.0, w, h]), f)
        assert float(win.size) == float(np.ceil(f * np.sqrt(w * h)))


# ---------------------------------------------------------------------------
# 4. Normalisation constants
# ---------------------------------------------------------------------------

def test_normalisation_matches_trackervit_params():
    p = cv2.TrackerVit_Params()
    cfg = ModelConfig()
    np.testing.assert_allclose(cfg.norm_mean, tuple(p.meanvalue)[:3])
    np.testing.assert_allclose(cfg.norm_std, tuple(p.stdvalue)[:3])
