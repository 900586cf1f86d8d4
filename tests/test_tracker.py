"""Tracker integration: init/update on synthetic video.

The reference ships zero tests (SURVEY.md §4); this harness substitutes —
the training-free correlation head must genuinely follow a patterned
square, validating crop geometry, decode, coordinate mapping, and the
HBM-state carry end-to-end.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
from gstreamer_vit_tracker_tpu.models import vittrack
from gstreamer_vit_tracker_tpu.tracker import core, multi, state

CORR = ModelConfig(template_size=64, search_size=128, patch_size=8,
                   embed_dim=64, depth=0, num_heads=2, head_mode="corr",
                   dtype="float32")


def iou(a, b):
    ax1, ay1, ax2, ay2 = a[0], a[1], a[0] + a[2], a[1] + a[3]
    bx1, by1, bx2, by2 = b[0], b[1], b[0] + b[2], b[1] + b[3]
    ix = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    iy = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = ix * iy
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


@pytest.fixture(scope="module")
def corr_params():
    return vittrack.init_params(jax.random.PRNGKey(42), CORR)


def test_init_produces_state(corr_params):
    src = SyntheticSource(320, 256, obj_size=48, seed=3)
    frame = jnp.asarray(src.frame_rgb(0))
    st = core.init(corr_params, frame, jnp.asarray(src.bbox_at(0)), CORR)
    assert st.z_tok.shape == (CORR.num_template_tokens, CORR.embed_dim)
    assert float(st.score) == 1.0
    assert int(st.frame_idx) == 0


def test_update_returns_valid_bbox(corr_params):
    src = SyntheticSource(320, 256, obj_size=48, seed=3)
    frame = jnp.asarray(src.frame_rgb(0))
    st = core.init(corr_params, frame, jnp.asarray(src.bbox_at(0)), CORR)
    st2, bbox, conf = core.update(corr_params, st, frame, CORR, use_pallas=False)
    bbox = np.asarray(bbox)
    assert np.isfinite(bbox).all()
    assert 0 <= bbox[0] and bbox[0] + bbox[2] <= 320 + 1e-3
    assert 0 <= bbox[1] and bbox[1] + bbox[3] <= 256 + 1e-3
    assert int(st2.frame_idx) == 1


def test_tracks_moving_square(corr_params):
    """The end-to-end IoU harness: the correlation tracker must follow the
    synthetic target over 40 frames with healthy IoU vs ground truth."""
    src = SyntheticSource(320, 256, obj_size=48, seed=3, speed=3.0)
    st = core.init(corr_params, jnp.asarray(src.frame_rgb(0)),
                   jnp.asarray(src.bbox_at(0)), CORR)

    upd = jax.jit(lambda p, s, f: core.update(p, s, f, CORR, use_pallas=False))
    ious = []
    confs = []
    for i in range(1, 41):
        st, bbox, conf = upd(corr_params, st, jnp.asarray(src.frame_rgb(i)))
        ious.append(iou(np.asarray(bbox), np.asarray(src.bbox_at(i))))
        confs.append(float(conf))
    ious = np.asarray(ious)
    assert ious.mean() > 0.8, f"mean IoU {ious.mean():.3f}"
    assert ious[-1] > 0.7, f"final IoU {ious[-1]:.3f}"
    # Confidence stays above the session accept threshold while locked on
    # (tracker_context.rs:122 applies score > 0.25).
    assert min(confs) > 0.25


def test_confidence_drops_when_object_absent(corr_params):
    """Loss detection: pointing the search window at empty background must
    drive confidence below the 0.25 session threshold."""
    src = SyntheticSource(320, 256, obj_size=48, seed=3, speed=3.0)
    frame = jnp.asarray(src.frame_rgb(0))
    st = core.init(corr_params, frame, jnp.asarray(src.bbox_at(0)), CORR)
    st_tracked, _, conf_on = core.update(corr_params, st, frame, CORR,
                                         use_pallas=False)
    st_off = st._replace(bbox=jnp.asarray([20.0, 20.0, 48.0, 48.0]))
    _, _, conf_off = core.update(corr_params, st_off, frame, CORR,
                                 use_pallas=False)
    assert float(conf_on) > 0.25
    assert float(conf_off) < 0.25


def test_window_freeze_below_confidence_threshold(corr_params):
    """With confidence under window_freeze_threshold the carried bbox must
    hold (re-acquisition window); with the threshold disabled the decoded
    peak is followed regardless (cv2 TrackerVit's internal behaviour)."""
    import dataclasses

    src = SyntheticSource(320, 256, obj_size=48, seed=3, speed=3.0)
    frame = jnp.asarray(src.frame_rgb(0))
    st = core.init(corr_params, frame, jnp.asarray(src.bbox_at(0)), CORR)
    off_box = jnp.asarray([20.0, 20.0, 48.0, 48.0])   # empty background
    st_off = st._replace(bbox=off_box)
    _, bbox_frozen, conf = core.update(corr_params, st_off, frame, CORR,
                                       use_pallas=False)
    assert float(conf) < CORR.window_freeze_threshold
    assert np.array_equal(np.asarray(bbox_frozen), np.asarray(off_box))

    nofreeze = dataclasses.replace(CORR, window_freeze_threshold=0.0)
    st_off2 = core.init(corr_params, frame, jnp.asarray(src.bbox_at(0)),
                        nofreeze)._replace(bbox=jnp.copy(off_box))
    _, bbox_free, _ = core.update(corr_params, st_off2, frame, nofreeze,
                                  use_pallas=False)
    assert not np.array_equal(np.asarray(bbox_free), np.asarray(off_box))


def test_nv12_frame_format(corr_params):
    src = SyntheticSource(320, 256, obj_size=48, seed=3, fmt="nv12")
    y, uv = src.frame(0)
    frame = (jnp.asarray(y), jnp.asarray(uv))
    st = core.init(corr_params, frame, jnp.asarray(src.bbox_at(0)), CORR,
                   frame_format="nv12")
    st2, bbox, conf = core.update(corr_params, st, frame, CORR,
                                  frame_format="nv12")
    assert np.isfinite(np.asarray(bbox)).all()


def test_multi_object_vmap(corr_params):
    src = SyntheticSource(320, 256, obj_size=48, seed=3)
    frame = jnp.asarray(src.frame_rgb(0))
    bb = src.bbox_at(0)
    bboxes = jnp.asarray([bb, (10.0, 10.0, 40.0, 40.0)])
    st = multi.init_objects(corr_params, frame, bboxes, CORR)
    assert st.z_tok.shape[0] == 2
    active = jnp.asarray([True, False])
    st2, boxes, scores = multi.update_objects(corr_params, st, frame, active, CORR)
    # Inactive slot must be untouched.
    np.testing.assert_array_equal(np.asarray(st2.bbox[1]), np.asarray(st.bbox[1]))
    assert int(st2.frame_idx[1]) == 0
    assert int(st2.frame_idx[0]) == 1


def test_multi_stream_vmap(corr_params):
    s1 = SyntheticSource(320, 256, obj_size=48, seed=3)
    s2 = SyntheticSource(320, 256, obj_size=48, seed=7)
    frames = jnp.stack([jnp.asarray(s1.frame_rgb(0)), jnp.asarray(s2.frame_rgb(0))])
    bboxes = jnp.asarray([[s1.bbox_at(0)], [s2.bbox_at(0)]])
    st = multi.init_streams(corr_params, frames, bboxes, CORR)
    assert st.z_tok.shape[:2] == (2, 1)
    active = jnp.ones((2, 1), bool)
    st2, boxes, scores = multi.update_streams(corr_params, st, frames, active, CORR)
    assert boxes.shape == (2, 1, 4)
    assert np.isfinite(np.asarray(boxes)).all()


def test_template_update_masked(corr_params):
    cfg = dataclasses.replace(CORR, template_update_enabled=True,
                              template_update_threshold=0.0,
                              template_update_interval=1)
    src = SyntheticSource(320, 256, obj_size=48, seed=3)
    frame = jnp.asarray(src.frame_rgb(0))
    st = core.init(corr_params, frame, jnp.asarray(src.bbox_at(0)), cfg)
    st2, _, _ = core.update(corr_params, st, frame, cfg, use_pallas=False)
    # Template actually updated (blend of init + re-embed).
    assert not np.array_equal(np.asarray(st2.z_tok), np.asarray(st.z_tok))
    np.testing.assert_array_equal(np.asarray(st2.z_tok_init),
                                  np.asarray(st.z_tok_init))


def test_state_stack_and_zeros():
    z = state.zeros_state(CORR)
    stacked = state.stack_states([z, z, z])
    assert stacked.bbox.shape == (3, 4)


def test_exclusive_suppresses_duplicate_lock(corr_params):
    """Two slots initialised on the SAME target: with exclusive=True the
    lower-confidence duplicate reverts to its previous box, zeroes its
    confidence (below the Lost threshold) and starts the re-detection
    counter; without it both keep tracking the same target."""
    src = SyntheticSource(320, 256, obj_size=48, seed=3)
    frame0 = jnp.asarray(src.frame_rgb(0))
    bb = src.bbox_at(0)
    bboxes = jnp.asarray([bb, bb])          # duplicate lock by construction
    st = multi.init_objects(corr_params, frame0, bboxes, CORR)
    active = jnp.ones((2,), bool)
    frame1 = jnp.asarray(src.frame_rgb(1))

    st_plain, b_plain, s_plain = multi.update_objects(
        corr_params, st, frame1, active, CORR)
    assert iou(np.asarray(b_plain[0]), np.asarray(b_plain[1])) > 0.9

    st_x, b_x, s_x = multi.update_objects(
        corr_params, st, frame1, active, CORR, exclusive=True)
    # Winner unchanged vs the plain step; loser frozen at its previous box.
    loser = 1 if float(s_plain[0]) >= float(s_plain[1]) else 0
    winner = 1 - loser
    np.testing.assert_allclose(np.asarray(b_x[winner]),
                               np.asarray(b_plain[winner]))
    np.testing.assert_allclose(np.asarray(b_x[loser]),
                               np.asarray(st.bbox[loser]))
    assert float(s_x[loser]) == 0.0
    assert int(st_x.lost_frames[loser]) == 1
    assert int(st_x.lost_frames[winner]) == 0


def test_exclusive_leaves_separated_targets_alone(corr_params):
    """Slots on genuinely different targets are untouched by exclusive."""
    src = SyntheticSource(320, 256, obj_size=48, seed=3)
    frame0 = jnp.asarray(src.frame_rgb(0))
    bboxes = jnp.asarray([src.bbox_at(0), (10.0, 10.0, 48.0, 48.0)])
    st = multi.init_objects(corr_params, frame0, bboxes, CORR)
    active = jnp.ones((2,), bool)
    frame1 = jnp.asarray(src.frame_rgb(1))
    _, b_plain, s_plain = multi.update_objects(
        corr_params, st, frame1, active, CORR)
    _, b_x, s_x = multi.update_objects(
        corr_params, st, frame1, active, CORR, exclusive=True)
    np.testing.assert_allclose(np.asarray(b_x), np.asarray(b_plain))
    np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_plain))


def test_exclusive_loser_template_not_contaminated(corr_params):
    """A suppressed duplicate must keep its pre-update template: the online
    template update runs before suppression and would otherwise blend the
    RIVAL target's appearance into the loser's z_tok, poisoning the
    re-detection the mechanism exists to enable."""
    cfg = dataclasses.replace(CORR, template_update_enabled=True,
                              template_update_interval=1,
                              template_update_threshold=0.0)
    src = SyntheticSource(320, 256, obj_size=48, seed=3)
    frame0 = jnp.asarray(src.frame_rgb(0))
    bb = src.bbox_at(0)
    st = multi.init_objects(corr_params, frame0, jnp.asarray([bb, bb]), cfg)
    active = jnp.ones((2,), bool)
    frame1 = jnp.asarray(src.frame_rgb(1))
    _, _, s_plain = multi.update_objects(corr_params, st, frame1, active, cfg)
    loser = 1 if float(s_plain[0]) >= float(s_plain[1]) else 0
    st_x, _, _ = multi.update_objects(corr_params, st, frame1, active, cfg,
                                      exclusive=True)
    np.testing.assert_array_equal(np.asarray(st_x.z_tok[loser]),
                                  np.asarray(st.z_tok[loser]))
    # the winner's template DID update (interval 1, threshold 0)
    assert not np.array_equal(np.asarray(st_x.z_tok[1 - loser]),
                              np.asarray(st.z_tok[1 - loser]))


def test_size_rate_limit_caps_pathological_growth(rng):
    """config.size_rate_limit: a decoded box may not grow/shrink more
    than the configured fraction per frame (the periodic-texture
    window-growth feedback observed on the independent world); 0 turns
    the clamp off."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.models import vittrack
    from gstreamer_vit_tracker_tpu.tracker import core

    cfg = ModelConfig(template_size=32, search_size=64, patch_size=16,
                      embed_dim=32, depth=1, num_heads=2, dtype="float32",
                      size_rate_limit=0.25, size_conf_freeze=0.0)
    params = vittrack.init_params(jax.random.PRNGKey(3), cfg)
    frame = jnp.asarray(rng.integers(0, 256, (128, 160, 3), np.uint8))
    bbox0 = jnp.asarray([60.0, 50.0, 24.0, 24.0])
    st = core.init(params, frame, bbox0, cfg)
    # Random-weight heads decode arbitrary sizes; with the clamp the
    # per-frame ratio is bounded regardless.
    prev = np.asarray(st.bbox)[2:4]
    for _ in range(6):
        st, bbox, _ = core.update_jit(params, st, frame, cfg)
        wh = np.asarray(bbox)[2:4]
        ratio = wh / prev
        assert (ratio <= 1.2501).all() and (ratio >= 1 / 1.2501).all(), ratio
        prev = np.asarray(st.bbox)[2:4]

    off = dataclasses.replace(cfg, size_rate_limit=0.0)
    st2 = core.init(params, frame, bbox0, off)
    st2, bbox2, _ = core.update_jit(params, st2, frame, off)
    # With the clamp off the same weights are free to jump further in
    # one step than the clamped path ever can (random heads make the
    # decoded size far from the seed box).
    r2 = np.asarray(bbox2)[2:4] / np.asarray(bbox0)[2:4]
    assert (r2 > 1.2501).any() or (r2 < 1 / 1.2501).any(), r2


def test_size_conf_freeze_holds_size_not_position(rng):
    """config.size_conf_freeze: below the confidence gate the box SIZE
    holds its previous value while position keeps updating (the other
    half of the lattice-balloon fix — the pathology rides the
    half-confident band between window_freeze_threshold and normal
    tracking)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.models import vittrack
    from gstreamer_vit_tracker_tpu.tracker import core

    # window_freeze off so position always updates; gate at 0.999 means
    # every frame is "half-confident" (conf <= 1 by construction).
    cfg = ModelConfig(template_size=32, search_size=64, patch_size=16,
                      embed_dim=32, depth=1, num_heads=2, dtype="float32",
                      size_rate_limit=0.0, window_freeze_threshold=0.0,
                      size_conf_freeze=0.999)
    params = vittrack.init_params(jax.random.PRNGKey(3), cfg)
    frame = jnp.asarray(rng.integers(0, 256, (128, 160, 3), np.uint8))
    bbox0 = jnp.asarray([60.0, 50.0, 24.0, 24.0])
    st = core.init(params, frame, bbox0, cfg)
    moved = False
    for _ in range(4):
        st, bbox, _ = core.update_jit(params, st, frame, cfg)
        b = np.asarray(bbox)
        assert np.allclose(b[2:4], [24.0, 24.0]), b   # size held
        moved = moved or not np.allclose(b[0:2], [60.0, 50.0])
    assert moved, "position should keep updating under the size gate"

    # Gate off: the same random heads decode a size away from the seed.
    free = dataclasses.replace(cfg, size_conf_freeze=0.0)
    st2 = core.init(params, frame, bbox0, free)
    st2, bbox2, _ = core.update_jit(params, st2, frame, free)
    assert not np.allclose(np.asarray(bbox2)[2:4], [24.0, 24.0])
