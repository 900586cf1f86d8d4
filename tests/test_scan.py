"""Scan-based sequence tracking matches the per-frame loop exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
from gstreamer_vit_tracker_tpu.models import vittrack
from gstreamer_vit_tracker_tpu.tracker import core, scan

CORR = ModelConfig(template_size=64, search_size=128, patch_size=8,
                   embed_dim=64, depth=0, num_heads=2, head_mode="corr",
                   dtype="float32")


def test_scan_matches_loop():
    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    src = SyntheticSource(320, 256, obj_size=48, seed=3, speed=3.0)
    bb0 = jnp.asarray(src.bbox_at(0))
    frames = jnp.stack([jnp.asarray(src.frame_rgb(i)) for i in range(1, 11)])

    st_loop = core.init(params, jnp.asarray(src.frame_rgb(0)), bb0, CORR)
    st_scan = jax.tree.map(jnp.copy, st_loop)

    loop_boxes = []
    for i in range(10):
        st_loop, bbox, conf = core.update(params, st_loop, frames[i], CORR,
                                          use_pallas=False)
        loop_boxes.append(np.asarray(bbox))

    st2, boxes, scores = scan.update_scan(params, st_scan, frames, CORR)
    np.testing.assert_allclose(np.asarray(boxes), np.stack(loop_boxes),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(st2.bbox), np.asarray(st_loop.bbox),
                               atol=1e-4)
    assert scores.shape == (10,)


def test_scan_nv12_and_pool():
    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    src = SyntheticSource(128, 96, obj_size=32, seed=1, fmt="nv12")
    y0, uv0 = src.frame(0)
    ys = jnp.stack([jnp.asarray(src.frame(i)[0]) for i in range(4)])
    uvs = jnp.stack([jnp.asarray(src.frame(i)[1]) for i in range(4)])
    st = core.init(params, (jnp.asarray(y0), jnp.asarray(uv0)),
                   jnp.asarray(src.bbox_at(0)), CORR, frame_format="nv12")
    st2, scores = scan.update_scan_pool(params, st, (ys, uvs), 12, CORR,
                                        frame_format="nv12")
    assert scores.shape == (12,)
    assert np.isfinite(np.asarray(scores)).all()
    assert int(st2.frame_idx) == 12


def test_scan_hud_pool_composites_every_frame():
    from gstreamer_vit_tracker_tpu.ops import font

    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    src = SyntheticSource(256, 192, obj_size=32, seed=1, fmt="nv12")
    y0, uv0 = src.frame(0)
    ys = jnp.stack([jnp.asarray(src.frame(i)[0]) for i in range(3)])
    uvs = jnp.stack([jnp.asarray(src.frame(i)[1]) for i in range(3)])
    st = core.init(params, (jnp.asarray(y0), jnp.asarray(uv0)),
                   jnp.asarray(src.bbox_at(0)), CORR, frame_format="nv12")
    hud_text = (font.encode_text("TRACKING", 12),
                font.encode_text("FPS: 60.0", 16),
                font.encode_text("trk: 0.3ms", 16))
    st2, disp, scores = scan.update_scan_hud_pool(params, st, (ys, uvs),
                                                  hud_text, 5, CORR)
    assert scores.shape == (5,)
    assert int(st2.frame_idx) == 5
    disp = np.asarray(disp)
    # State text at (15, 15) scale 2: the 'T' glyph's top row is lit 255.
    assert (disp[15:29, 15:27] == 255).any()
    # The display buffer is the LAST frame (pool index 4 % 3 == 1) plus a
    # sparse HUD: most pixels pass through untouched, some are overwritten.
    src_luma = np.asarray(ys[1])
    diff_frac = (disp != src_luma).mean()
    assert 0.0 < diff_frac < 0.05


def test_streams_scan_matches_loop():
    from gstreamer_vit_tracker_tpu.tracker import multi

    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    pool, s = 3, 2
    src = SyntheticSource(160, 128, obj_size=32, seed=1, fmt="nv12")
    pool_ys = jnp.stack([jnp.asarray(src.frame(i)[0]) for i in range(pool)])
    pool_uvs = jnp.stack([jnp.asarray(src.frame(i)[1]) for i in range(pool)])
    bb0 = jnp.asarray(src.bbox_at(0))
    bbs = jnp.tile(bb0[None, None], (s, 1, 1))
    active = jnp.ones((s, 1), bool)
    ys0 = pool_ys[:s]
    uvs0 = pool_uvs[:s]

    st_a = multi.init_streams(params, (ys0, uvs0), bbs, CORR, "nv12")
    st_b = jax.tree.map(jnp.copy, st_a)

    reps = 4
    loop_scores = []
    for i in range(reps):
        idx = np.array([(i + k) % pool for k in range(s)])
        fr = (pool_ys[idx], pool_uvs[idx])
        st_a, _bx, sc = multi.update_streams(params, st_a, fr, active, CORR,
                                             "nv12")
        loop_scores.append(np.asarray(sc))

    st_c, scores = scan.update_streams_scan_pool(
        params, st_b, (pool_ys, pool_uvs), active, reps, CORR, "nv12")
    np.testing.assert_allclose(np.asarray(scores), np.stack(loop_scores),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_c.bbox), np.asarray(st_a.bbox),
                               atol=1e-3)


def test_reinit_after_donated_scan_keeps_caller_buffers():
    """Donating the scanned state must not delete the caller's bbox array:
    eager init must copy it into TrackState (the bench re-inits with the
    same bboxes after the warmup scan — regression for the aliased-donation
    crash)."""
    from gstreamer_vit_tracker_tpu.tracker import multi

    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    src = SyntheticSource(160, 128, obj_size=32, seed=1, fmt="nv12")
    pool_ys = jnp.stack([jnp.asarray(src.frame(i)[0]) for i in range(2)])
    pool_uvs = jnp.stack([jnp.asarray(src.frame(i)[1]) for i in range(2)])
    bbs = jnp.tile(jnp.asarray(src.bbox_at(0))[None, None], (2, 1, 1))
    active = jnp.ones((2, 1), bool)

    st = multi.init_streams(params, (pool_ys, pool_uvs), bbs, CORR, "nv12")
    st, _ = scan.update_streams_scan_pool(     # donates st (and its .bbox)
        params, st, (pool_ys, pool_uvs), active, 2, CORR, "nv12")
    # Re-init with the SAME caller arrays — must not see deleted buffers.
    st2 = multi.init_streams(params, (pool_ys, pool_uvs), bbs, CORR, "nv12")
    assert np.isfinite(np.asarray(st2.bbox)).all()


def test_streams_scan_more_streams_than_pool():
    """S > P: the cyclic pool extension must still give stream s frame
    (i + s) % P, matching the explicit-gather loop."""
    from gstreamer_vit_tracker_tpu.tracker import multi

    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    pool, s = 2, 5
    src = SyntheticSource(160, 128, obj_size=32, seed=1, fmt="nv12")
    pool_ys = jnp.stack([jnp.asarray(src.frame(i)[0]) for i in range(pool)])
    pool_uvs = jnp.stack([jnp.asarray(src.frame(i)[1]) for i in range(pool)])
    bb0 = jnp.asarray(src.bbox_at(0))
    bbs = jnp.tile(bb0[None, None], (s, 1, 1))
    active = jnp.ones((s, 1), bool)
    init_fr = (pool_ys[jnp.arange(s) % pool], pool_uvs[jnp.arange(s) % pool])

    st_a = multi.init_streams(params, init_fr, bbs, CORR, "nv12")
    st_b = jax.tree.map(jnp.copy, st_a)

    reps = 3
    loop_scores = []
    for i in range(reps):
        idx = np.array([(i + k) % pool for k in range(s)])
        st_a, _bx, sc = multi.update_streams(
            params, st_a, (pool_ys[idx], pool_uvs[idx]), active, CORR, "nv12")
        loop_scores.append(np.asarray(sc))

    st_c, scores = scan.update_streams_scan_pool(
        params, st_b, (pool_ys, pool_uvs), active, reps, CORR, "nv12")
    np.testing.assert_allclose(np.asarray(scores), np.stack(loop_scores),
                               atol=1e-4)


def test_objects_scan_pool_runs():
    from gstreamer_vit_tracker_tpu.tracker import multi

    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    src = SyntheticSource(160, 128, obj_size=32, seed=1, fmt="nv12")
    pool_ys = jnp.stack([jnp.asarray(src.frame(i)[0]) for i in range(3)])
    pool_uvs = jnp.stack([jnp.asarray(src.frame(i)[1]) for i in range(3)])
    bb0 = np.asarray(src.bbox_at(0), np.float32)
    bbs = jnp.asarray(np.stack([bb0, bb0 + [8, 4, 0, 0]]))
    active = jnp.ones((2,), bool)
    st = multi.init_objects(params, (pool_ys[0], pool_uvs[0]), bbs, CORR,
                            "nv12")
    st, scores = scan.update_objects_scan_pool(
        params, st, (pool_ys, pool_uvs), active, 5, CORR, "nv12")
    assert scores.shape == (5, 2)
    assert np.isfinite(np.asarray(scores)).all()


def test_update_packed_matches_unpacked():
    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    src = SyntheticSource(320, 256, obj_size=48, seed=3)
    frame = jnp.asarray(src.frame_rgb(1))
    bb0 = jnp.asarray(src.bbox_at(0))
    st_a = core.init(params, jnp.asarray(src.frame_rgb(0)), bb0, CORR)
    st_b = jax.tree.map(jnp.copy, st_a)
    _, bbox, conf = core.update_jit(params, st_a, frame, CORR)
    _, packed = core.update_packed_jit(params, st_b, frame, CORR)
    packed = np.asarray(packed)
    np.testing.assert_allclose(packed[:4], np.asarray(bbox), atol=1e-5)
    np.testing.assert_allclose(packed[4], float(conf), atol=1e-5)


def test_pipelined_backend_lags_one_frame():
    from gstreamer_vit_tracker_tpu.session.machine import JaxTrackerBackend

    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    src = SyntheticSource(320, 256, obj_size=48, seed=3, speed=3.0)
    bb0 = tuple(float(v) for v in src.bbox_at(0))

    serial = JaxTrackerBackend(params, CORR)
    piped = JaxTrackerBackend(params, CORR, pipelined=True)
    serial.init(src.frame_rgb(0), bb0)
    piped.init(src.frame_rgb(0), bb0)

    serial_results = [serial.update(src.frame_rgb(i)) for i in range(1, 6)]
    piped_results = [piped.update(src.frame_rgb(i)) for i in range(1, 6)]

    # Pipelined frame 1 returns its own (first) result, then lags by one.
    np.testing.assert_allclose(piped_results[0][0], serial_results[0][0],
                               atol=1e-4)
    for k in range(1, 5):
        np.testing.assert_allclose(piped_results[k][0],
                                   serial_results[k - 1][0], atol=1e-4)
