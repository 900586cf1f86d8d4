"""Hard-world synthetic source tests: scale schedule, occlusion sweep,
distractors, and the held-out generator family.

The reference's tracker faces scale change, occlusion and clutter from real
camera video (/root/reference/src/tracker_context.rs:120-138 consumes
per-frame bbox+score under arbitrary motion); these tests pin the synthetic
analogs that train/eval that robustness.
"""

import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.media.source import (HeldoutSource,
                                                    SyntheticSource)


def test_default_world_unchanged():
    """Default-args rendering must stay identical to the plain path (the
    round-1/2 checkpoints and goldens were trained/pinned on it)."""
    src = SyntheticSource(320, 256, obj_size=48, seed=3)
    f = src.frame_rgb(17)
    img, _ = src.frame_rgb_at(*src.bbox_at(17)[:2], 17)
    assert np.array_equal(f, img)
    assert src.scale_at(123) == 1.0
    assert src.visible_frac_at(123) == 1.0
    assert src.occluder_rect_at(123) is None


def test_scale_schedule_sweeps_range_and_stays_in_frame():
    src = SyntheticSource(640, 512, obj_size=64, seed=1,
                          scale_range=(0.5, 2.0), scale_period=600)
    sizes = [src.bbox_at(i)[2] for i in range(0, 600, 25)]
    assert min(sizes) <= 34 and max(sizes) >= 126
    for i in range(0, 600, 7):
        x, y, w, h = src.bbox_at(i)
        assert x >= 0 and y >= 0 and x + w <= 640 and y + h <= 512
    # The rendered target really is w px wide: the bright 250-border shows
    # at the box edge at both extremes of the sweep (bilinear downsampling
    # softens the 3-px border at the trough, hence the looser floor there).
    for i, floor in ((150, 240), (450, 170)):    # scale peak / trough
        x, y, w, h = src.bbox_at(i)
        f = src.frame_rgb(i)
        assert f[int(y) + 1, int(x) + 1].min() >= floor
        assert f[int(y + h) - 2, int(x + w) - 2].min() >= floor


def test_occlusion_full_at_midpoint_clear_outside():
    src = SyntheticSource(640, 512, obj_size=64, seed=2, occlusion=(200, 41))
    # Windows are centred mid-period: frames [100, 141) are the first one,
    # so the sequence start (incl. the init frame) is always clean.
    assert all(src.visible_frac_at(i) == 1.0 for i in range(0, 100, 9))
    assert src.visible_frac_at(160) == 1.0
    vis = [src.visible_frac_at(i) for i in range(100, 141)]
    assert min(vis) == 0.0
    assert vis[0] > 0.95 and vis[-1] > 0.95
    # At the midpoint the rendered target area shows the occluder slab
    # (dark gray), not the bright target border.
    i = 100 + int(np.argmin(vis))
    x, y, w, h = src.bbox_at(i)
    f = src.frame_rgb(i)
    assert f[int(y) + 2:int(y) + 6, int(x) + 2:int(x) + 6].max() < 200


def test_distractors_deterministic_and_present():
    mk = lambda: SyntheticSource(640, 512, obj_size=64, seed=4,  # noqa: E731
                                 n_distractors=2)
    a, b = mk().frame_rgb(33), mk().frame_rgb(33)
    assert np.array_equal(a, b)
    plain = SyntheticSource(640, 512, obj_size=64, seed=4).frame_rgb(33)
    assert not np.array_equal(a, plain)
    # Distractors render UNDER the target: the target area is unchanged.
    src = mk()
    x, y, w, h = src.bbox_at(33)
    ys, xs = slice(int(y), int(y + h)), slice(int(x), int(x + w))
    assert np.array_equal(src.frame_rgb(33)[ys, xs], plain[ys, xs])


def test_masked_target_silhouettes():
    """Ellipse/diamond alpha masks show background at the gt box corners
    while the centre still shows the patch; default stays rectangular."""
    for style in ("ellipse", "diamond"):
        src = SyntheticSource(320, 256, obj_size=48, seed=5,
                              mask_style=style)
        x, y, w, h = src.bbox_at(9)
        f = src.frame_rgb(9)
        bg = src.background
        xi, yi = int(round(x)), int(round(y))
        # Corners of the box lie outside the silhouette -> pure background.
        for cy, cx in ((yi, xi), (yi, xi + int(w) - 1),
                       (yi + int(h) - 1, xi), (yi + int(h) - 1,
                                               xi + int(w) - 1)):
            assert np.array_equal(f[cy, cx], bg[cy, cx]), style
        # Centre shows the patch, not the background.
        cyc, cxc = yi + int(h) // 2, xi + int(w) // 2
        assert not np.array_equal(f[cyc, cxc], bg[cyc, cxc])
    # Default construction draws nothing extra from the rng: scenes with
    # and without the new kwargs are bit-identical.
    a = SyntheticSource(320, 256, obj_size=48, seed=5).frame_rgb(9)
    b = SyntheticSource(320, 256, obj_size=48, seed=5, mask_style="none",
                        edge_fade=0.0).frame_rgb(9)
    assert np.array_equal(a, b)


def test_edge_fade_blends_toward_background():
    """edge_fade ramps target alpha to 0 at the silhouette edge: border
    pixels move toward the background value, the centre stays pure patch,
    and alpha is monotone along a ray."""
    src = SyntheticSource(320, 256, obj_size=48, seed=6, edge_fade=0.5)
    x, y, w, h = src.bbox_at(9)
    xi, yi = int(round(x)), int(round(y))
    f = src.frame_rgb(9).astype(int)
    bg = src.background.astype(int)
    patch = src._patch_at(int(w)).astype(int)
    cyc = yi + int(h) // 2
    # Box-edge pixel (alpha ~ 1/size, not exactly 0 at the pixel centre)
    # sits essentially on the background; centre (alpha 1) is pure patch.
    assert np.abs(f[cyc, xi] - bg[cyc, xi]).max() <= 12
    assert (np.abs(f[cyc, xi] - bg[cyc, xi]).max()
            < np.abs(patch[int(h) // 2, int(w) // 2]
                     - bg[cyc, xi + int(w) // 2]).max())
    assert np.array_equal(f[cyc, xi + int(w) // 2],
                          np.clip(patch[int(h) // 2, int(w) // 2], 0, 255))
    # Mid-fade pixel is strictly between background and patch.
    alpha = src._alpha_at(int(w))
    j = int(np.argmin(np.abs(alpha[int(h) // 2] - 0.5)))
    mid = f[cyc, xi + j]
    lo = np.minimum(bg[cyc, xi + j], patch[int(h) // 2, j])
    hi = np.maximum(bg[cyc, xi + j], patch[int(h) // 2, j])
    assert ((lo <= mid) & (mid <= hi)).all()


def test_heldout_world_contract():
    src = HeldoutSource(320, 256, obj_size=48, seed=0)
    f = src.frame_rgb(12)
    assert f.shape == (256, 320, 3) and f.dtype == np.uint8
    x, y, w, h = src.bbox_at(12)
    assert 0 <= x and x + w <= 320 and 0 <= y and y + h <= 256
    # Deterministic, and a different family from SyntheticSource.
    assert np.array_equal(f, HeldoutSource(320, 256, obj_size=48,
                                           seed=0).frame_rgb(12))
    other = SyntheticSource(320, 256, obj_size=48, seed=0).frame_rgb(12)
    assert not np.array_equal(f, other)
    # The polygon target occupies a substantial part of its gt box.
    box = f[int(y):int(y + h), int(x):int(x + w)]
    bg = HeldoutSource(320, 256, obj_size=48, seed=0).background[
        int(y):int(y + h), int(x):int(x + w)]
    assert (np.abs(box.astype(int) - bg.astype(int)).sum(-1) > 30).mean() > 0.3


def test_nv12_yuy2_formats_compose_with_worlds():
    for fmt in ("nv12", "yuy2"):
        src = SyntheticSource(64, 32, obj_size=12, seed=0, fmt=fmt,
                              scale_range=(0.8, 1.2), n_distractors=1,
                              occlusion=(50, 11))
        f = src.frame(5)
        if fmt == "nv12":
            y, uv = f
            assert y.shape == (32, 64) and uv.shape == (16, 32, 2)
        else:
            assert f.shape == (32, 128)


def test_eval_scenario_runner_wiring(tmp_path):
    """The scenario eval CLI runs end to end on CPU (corr-tiny, tiny
    frames) for every scenario, including the summarize metrics and the
    --json machine-readable summary."""
    import json
    import sys
    sys.path.insert(0, ".")
    from scripts import eval_tracking

    out = tmp_path / "summary.json"
    rc = eval_tracking.main([
        "--preset", "corr-tiny", "--scenario", "all", "--seqs", "1",
        "--frames", "12", "--width", "160", "--height", "128",
        "--json", str(out)])
    assert rc == 0
    summary = json.loads(out.read_text())
    assert set(summary["scenarios"]) == set(eval_tracking.SCENARIOS)
    for s in summary["scenarios"].values():
        assert 0.0 <= s["mean_iou"] <= 1.0 and "lost_frames" in s
    # '+'-composed hardenings stack on one scene.
    rc = eval_tracking.main([
        "--preset", "corr-tiny", "--scenario", "occlusion+shake",
        "--seqs", "1", "--frames", "12", "--width", "160",
        "--height", "128"])
    assert rc == 0


@pytest.mark.slow
def test_eval_matched_tracker_wiring(tmp_path):
    """--tracker matched (the named reference-parity mode: our flagship
    forward under cv2.TrackerVit's measured crop/decode/int-Rect pipeline,
    compat/cv2vit.py) runs end to end through the eval CLI and produces
    sane metrics without cv2 installed."""
    import json
    import sys
    sys.path.insert(0, ".")
    from scripts import eval_tracking

    out = tmp_path / "matched.json"
    rc = eval_tracking.main([
        "--preset", "vittrack-t", "--tracker", "matched", "--seqs", "1",
        "--frames", "6", "--width", "320", "--height", "256",
        "--json", str(out)])
    assert rc == 0
    summary = json.loads(out.read_text())
    assert summary["mode"] == "matched"
    s = summary["scenarios"]["basic"]
    # Integer-Rect trajectories still track (shipped flagship checkpoint).
    assert s["mean_iou"] > 0.5 and s["lost_frames"] == 0
    # Non-flagship presets are rejected up front (cv2's fixed 128/256).
    assert eval_tracking.main(
        ["--preset", "small", "--tracker", "matched"]) == 2


def test_eval_summarize_metrics():
    import sys
    sys.path.insert(0, ".")
    from scripts.eval_tracking import summarize

    rows = np.asarray(
        # iou, conf, visible
        [[0.9, 0.9, 1.0]] * 10
        + [[0.0, 0.1, 0.0]] * 5          # hidden stretch
        + [[0.2, 0.2, 1.0]] * 6          # settle (skipped by reacquire)
        + [[0.8, 0.9, 1.0]] * 14)        # re-acquired
    s = summarize("occlusion", rows, 0.25)
    assert s["hidden_conf_max"] == 0.1
    assert s["hidden_below_thr_frac"] == 1.0
    assert 0.7 < s["reacquire_iou"] <= 0.8
    assert s["lost_frames"] == 6


def test_eval_multi_object_runner():
    """--objects N tracks primary + distractors through the batched step
    with per-object ground truth (media.source.object_bbox_at)."""
    import sys
    sys.path.insert(0, ".")
    from scripts import eval_tracking

    rc = eval_tracking.main([
        "--preset", "corr-tiny", "--objects", "2", "--seqs", "1",
        "--frames", "10", "--width", "192", "--height", "160"])
    assert rc == 0


def test_object_bbox_at_ground_truth():
    from gstreamer_vit_tracker_tpu.media.source import SyntheticSource

    src = SyntheticSource(320, 256, obj_size=40, seed=1, n_distractors=2)
    assert src.object_bbox_at(0, 7) == src.bbox_at(7)
    for k in (1, 2):
        x, y, w, h = src.object_bbox_at(k, 7)
        assert (w, h) == (40.0, 40.0)
        dx, dy = src._distractor_pos(k - 1, 7)
        assert (x, y) == (float(dx), float(dy))
        # The distractor patch is really rendered at that position.
        img = src.frame_rgb(7)
        patch = src._patch_at(40, k - 1)
        sub = img[int(y):int(y) + 40, int(x):int(x) + 40]
        if sub.shape == patch.shape:          # fully in frame
            # target/occluder may overdraw; require majority agreement
            frac = (sub == patch).all(axis=-1).mean()
            assert frac > 0.5, frac


def test_eval_precision_metrics():
    """5-column rows (with center errors) yield the OTB precision /
    TrackingNet norm-precision metrics; 3-column rows still work."""
    import sys
    sys.path.insert(0, ".")
    from scripts.eval_tracking import center_errors, summarize

    raw, norm = center_errors(np.array([10, 10, 20, 20]),
                              np.array([13, 14, 20, 20]))
    assert raw == pytest.approx(5.0)
    assert norm == pytest.approx(0.25)

    rows = np.asarray(
        [[0.9, 0.9, 1.0, 3.0, 0.05]] * 8       # tight
        + [[0.4, 0.8, 1.0, 25.0, 0.5]] * 2)    # off-center
    s = summarize("basic", rows, 0.25)
    assert s["precision_20px"] == pytest.approx(0.8)
    assert s["norm_precision_02"] == pytest.approx(0.8)

    legacy = summarize("basic", rows[:, :3], 0.25)
    assert "precision_20px" not in legacy


def test_shake_world_gt_follows_camera():
    """Camera shake translates gt and render together: the target's
    bright border sits at the (shaken) bbox corner, the offset really
    reaches +-shake_px scale, and shake_px=0 leaves frames bit-identical
    to the default world."""
    src = SyntheticSource(640, 512, obj_size=64, seed=3, shake_px=24.0)
    offs = np.asarray([src.shake_at(i) for i in range(120)])
    assert np.abs(offs).max() >= 16      # the two sinusoids do align
    assert np.abs(offs).max() <= 48
    assert np.abs(np.diff(offs, axis=0)).max() >= 6   # violent per frame
    for i in (0, 17, 44, 90):
        x, y, w, h = src.bbox_at(i)
        f = src.frame_rgb(i)
        xi, yi = int(round(x)), int(round(y))
        if 0 <= xi + 1 < 640 and 0 <= yi + 1 < 512:
            assert f[yi + 1, xi + 1].min() >= 240     # bright border
    # Distractors and occluder shift with the same offset.
    occ = SyntheticSource(640, 512, obj_size=64, seed=3, shake_px=24.0,
                          occlusion=(200, 41))
    assert occ.visible_frac_at(120) == 0.0            # midpoint still full
    base = SyntheticSource(640, 512, obj_size=64, seed=3)
    np.testing.assert_array_equal(
        SyntheticSource(640, 512, obj_size=64, seed=3,
                        shake_px=0.0).frame_rgb(9), base.frame_rgb(9))


def test_rotation_world_spins_in_footprint():
    """rotation_dpf spins the target about its centre inside the same
    s-by-s footprint: 90-degree multiples are exact rot90s of the frame-0
    patch crop, gt box is unchanged, and rotation_dpf=0 stays
    bit-identical to the default world."""
    from gstreamer_vit_tracker_tpu.media.source import _rotate_patch

    src = SyntheticSource(640, 512, obj_size=64, seed=3, rotation_dpf=1.0)
    base = SyntheticSource(640, 512, obj_size=64, seed=3)
    # gt identical to the unrotated world (rotation is appearance-only)
    for i in (0, 33, 90):
        assert src.bbox_at(i) == base.bbox_at(i)
    np.testing.assert_array_equal(
        SyntheticSource(640, 512, obj_size=64, seed=3,
                        rotation_dpf=0.0).frame_rgb(9), base.frame_rgb(9))
    # exact-90deg check on the kernel itself: bilinear at integral
    # sample points degenerates to a permutation = np.rot90(k=-1)
    p = base.patch
    r90, a90 = _rotate_patch(p, None, 90.0)
    np.testing.assert_array_equal(r90, np.rot90(p, k=-1))
    assert a90.min() == 1.0                       # square covers square
    # 45deg: corners rotate out of the footprint -> alpha 0 there,
    # centre stays opaque
    _, a45 = _rotate_patch(p, None, 45.0)
    assert a45[0, 0] == 0.0 and a45[0, -1] == 0.0
    assert a45[32, 32] == 1.0
    # rendered frame at a quarter turn really shows the rotated patch
    x, y, w, h = src.bbox_at(90)
    f = src.frame_rgb(90)
    xi, yi = int(round(x)), int(round(y))
    crop = f[yi:yi + 64, xi:xi + 64]
    exp, _ = _rotate_patch(p, None, 90.0)
    np.testing.assert_array_equal(crop, exp)


def test_noise_world_deterministic_additive():
    """noise_sigma adds fresh per-frame Gaussian sensor noise:
    deterministic per (seed, frame), different across frames, absent at
    sigma=0, and roughly the requested magnitude."""
    src = SyntheticSource(320, 256, obj_size=48, seed=2, noise_sigma=12.0)
    f5a, f5b = src.frame_rgb(5), src.frame_rgb(5)
    np.testing.assert_array_equal(f5a, f5b)       # same frame -> same noise
    assert np.any(f5a != src.frame_rgb(6)[:, :, :])
    clean = SyntheticSource(320, 256, obj_size=48, seed=2)
    d = f5a.astype(np.float32) - clean.frame_rgb(5).astype(np.float32)
    assert 8.0 < d.std() < 16.0                   # ~sigma, minus clipping
    assert abs(d.mean()) < 2.0
    np.testing.assert_array_equal(
        SyntheticSource(320, 256, obj_size=48, seed=2,
                        noise_sigma=0.0).frame_rgb(5), clean.frame_rgb(5))


def test_morph_world_structural_crossfade():
    """morph_rate cross-fades the target texture into a different
    construction family: frame 0 is bit-identical to the default world,
    the morph endpoint is a full texture replacement (not a brightness
    scale of the original), intermediate frames are exact linear blends,
    gt is unchanged, and morph_rate=0 draws nothing extra from the rng."""
    src = SyntheticSource(320, 256, obj_size=48, seed=4, morph_rate=0.004)
    base = SyntheticSource(320, 256, obj_size=48, seed=4)
    # morph off -> bit-identical world (dedicated rng stream)
    np.testing.assert_array_equal(
        SyntheticSource(320, 256, obj_size=48, seed=4,
                        morph_rate=0.0).frame_rgb(7), base.frame_rgb(7))
    # frame 0: morph fraction 0, identical to the default world
    np.testing.assert_array_equal(src.frame_rgb(0), base.frame_rgb(0))
    assert src.morph_frac_at(0) == 0.0
    assert src.morph_frac_at(125) == 0.5
    assert src.morph_frac_at(10_000) == 1.0       # clamped
    # gt is appearance-only
    for i in (0, 50, 250):
        assert src.bbox_at(i) == base.bbox_at(i)
    # full morph (i >= 250): the rendered target IS the morph patch — a
    # different family (borderless), not any brightness scale of the
    # original (the bright 250-border would survive a pure fade).
    x, y, w, h = src.bbox_at(300)
    crop = src.frame_rgb(300)[int(round(y)):int(round(y)) + 48,
                              int(round(x)):int(round(x)) + 48]
    np.testing.assert_array_equal(crop, src._target_patch_at(48, 300))
    assert not np.array_equal(crop, base.patch)
    border_mean = crop[:3].mean()                 # old border was ~250
    assert border_mean < 200.0
    # intermediate frame: exact linear blend of the two endpoints
    mid = src._target_patch_at(48, 125)
    a = base.patch.astype(np.float32)
    b = src._target_patch_at(48, 10_000).astype(np.float32)
    np.testing.assert_array_equal(
        mid, np.clip(np.round(0.5 * a + 0.5 * b), 0, 255).astype(np.uint8))


def test_exit_world_leaves_and_reenters():
    """exit_spec: the target exits through the right frame edge, stays
    fully off-frame over the window plateau, and re-enters; visible_frac
    reports the in-frame fraction with the same ==1.0 contract the
    reacquire metric keys off."""
    src = SyntheticSource(640, 512, obj_size=48, seed=3,
                          exit_spec=(300, 100))
    # Window is centred mid-period: frames [150, 250).
    assert all(src.visible_frac_at(i) == 1.0 for i in range(0, 150, 7))
    assert src.visible_frac_at(260) == 1.0
    vis = np.array([src.visible_frac_at(i) for i in range(150, 250)])
    # Trapezoid: fully off-frame over the middle ~40% of the window.
    assert (vis[40:60] == 0.0).all()
    assert vis[0] > 0.9 and vis[-1] > 0.9
    # Both ramps pass through partially-out frames (the border sliver /
    # zero-pad regime), not a binary jump.
    partial = (vis > 0.0) & (vis < 1.0)
    assert partial[:40].any() and partial[60:].any()
    # Ground truth actually leaves the frame (left edge past the right
    # frame edge at the plateau) and the renderer shows pure background.
    x, _, w, _ = src.bbox_at(200)
    assert x >= src.width
    assert np.array_equal(src.frame_rgb(200), src.background)
    # Partially-out frames render the in-frame sliver only (no crash,
    # no wrap) and the default in-frame path is untouched elsewhere.
    src.frame_rgb(150 + int(np.flatnonzero(partial)[0]))
    plain = SyntheticSource(640, 512, obj_size=48, seed=3)
    assert np.array_equal(src.frame_rgb(10), plain.frame_rgb(10))


def test_exit_composes_with_occlusion_visibility():
    src = SyntheticSource(640, 512, obj_size=48, seed=4,
                          exit_spec=(300, 100), occlusion=(200, 41))
    vals = [src.visible_frac_at(i) for i in range(0, 300, 3)]
    assert all(0.0 <= v <= 1.0 for v in vals)


# ---------------------------------------------------------------------------
# Round-5 diversity v2: blob silhouettes + moving-background blobs
# ---------------------------------------------------------------------------

def test_bg_motion_defaults_bit_identical():
    """bg_motion=0 (the default) must not change any existing scene."""
    import numpy as np

    from gstreamer_vit_tracker_tpu.media.source import SyntheticSource

    a = SyntheticSource(320, 256, obj_size=40, seed=9)
    b = SyntheticSource(320, 256, obj_size=40, seed=9, bg_motion=0)
    for i in (0, 7, 40):
        assert np.array_equal(a.frame_rgb(i), b.frame_rgb(i))


def test_bg_motion_blobs_move_between_frames():
    import numpy as np

    from gstreamer_vit_tracker_tpu.media.source import SyntheticSource

    s = SyntheticSource(320, 256, obj_size=40, seed=9, bg_motion=4)
    x, y, w, h = (int(v) for v in s.bbox_at(0))
    f0, f30 = s.frame_rgb(0).astype(int), s.frame_rgb(30).astype(int)
    # Mask out target paths; background-only pixels still changed (blobs
    # moved) — static-world backgrounds never do.
    m = np.ones((256, 320), bool)
    for i in (0, 30):
        xi, yi, wi, hi = (int(v) for v in s.bbox_at(i))
        m[max(0, yi - 4):yi + hi + 4, max(0, xi - 4):xi + wi + 4] = False
    assert np.abs(f0 - f30).max(axis=-1)[m].mean() > 1.0
    # Ground truth unchanged by blobs.
    p = SyntheticSource(320, 256, obj_size=40, seed=9)
    assert s.bbox_at(17) == p.bbox_at(17)


def test_blob_mask_is_rotated_nonconvex_family():
    import numpy as np

    from gstreamer_vit_tracker_tpu.media.source import SyntheticSource

    s = SyntheticSource(320, 256, obj_size=48, seed=11, mask_style="blob",
                        edge_fade=0.12)
    a = s._alpha_at(48)
    assert a is not None and a.shape == (48, 48)
    assert 0.4 < a.mean() < 1.0          # silhouette, not full rect
    assert a.max() == 1.0                # opaque core
    # Differs from the ellipse family at the same seed.
    e = SyntheticSource(320, 256, obj_size=48, seed=11,
                        mask_style="ellipse", edge_fade=0.12)
    assert not np.allclose(a, e._alpha_at(48))


def test_data_diversity_v2_switch():
    import numpy as np

    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.train import data

    cfg = ModelConfig(template_size=32, search_size=64, patch_size=16,
                      embed_dim=32, depth=1, num_heads=2, dtype="float32")
    rng = np.random.default_rng(1)
    try:
        data.set_diversity("v2")
        styles = set()
        motions = []
        for _ in range(60):
            data.sample_raw(rng, cfg)
        for src in data._SOURCE_POOL.values():
            styles.add(src.mask_style)
            motions.append(src.bg_motion)
        assert "blob" in styles
        assert any(m > 0 for m in motions) and any(m == 0 for m in motions)
    finally:
        data.set_diversity("v1")
    # v1 pool never contains v2 features.
    for _ in range(40):
        data.sample_raw(rng, cfg)
    for src in data._SOURCE_POOL.values():
        assert src.mask_style != "blob" and src.bg_motion == 0


def test_data_diversity_v3_tables():
    """diversity v3 (round-5 second iteration): doubled periodic-tiles
    share and 1/2-coverage strong moving-background blobs; v1 pool stays
    free of every v2/v3 feature."""
    import numpy as np

    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.train import data

    cfg = ModelConfig(template_size=32, search_size=64, patch_size=16,
                      embed_dim=32, depth=1, num_heads=2, dtype="float32")
    rng = np.random.default_rng(2)
    try:
        data.set_diversity("v3")
        for _ in range(60):
            data.sample_raw(rng, cfg)
        pool = list(data._SOURCE_POOL.values())
        n_tiles = sum(s.patch_style == "tiles" for s in pool)
        n_bgm = sum(s.bg_motion > 0 for s in pool)
        # Tiles share roughly doubles vs v2's 1/6; strong blobs on ~1/2.
        assert n_tiles >= len(pool) // 4, (n_tiles, len(pool))
        assert n_bgm >= len(pool) // 3, (n_bgm, len(pool))
        assert any(s.bg_motion == 5 for s in pool)
    finally:
        data.set_diversity("v1")


def test_tiles_two_tone_variant_exists():
    """The v3 two-tone tiles variant: some tiles draws use exactly two
    distinct colours (high-frequency periodic two-colour regime)."""
    import numpy as np

    from gstreamer_vit_tracker_tpu.media.source import SyntheticSource

    two_tone = False
    for seed in range(24):
        s = SyntheticSource(160, 128, obj_size=48, seed=seed,
                            patch_style="tiles")
        interior = s.patch[4:-4, 4:-4].reshape(-1, 3)
        if len(np.unique(interior, axis=0)) == 2:
            two_tone = True
            break
    assert two_tone
