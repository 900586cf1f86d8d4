"""YUY2 fused-preprocess tracking path + TrackState checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
from gstreamer_vit_tracker_tpu.models import vittrack, weights
from gstreamer_vit_tracker_tpu.ops import preprocess as pp
from gstreamer_vit_tracker_tpu.tracker import core

CORR = ModelConfig(template_size=64, search_size=128, patch_size=8,
                   embed_dim=64, depth=0, num_heads=2, head_mode="corr",
                   dtype="float32")


def iou(a, b):
    ix = max(0.0, min(a[0] + a[2], b[0] + b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1]))
    inter = ix * iy
    return inter / (a[2] * a[3] + b[2] * b[3] - inter)


def test_preprocess_yuy2_matches_rgb_path(rng):
    """YUY2 fused preprocess ~= RGB preprocess of the same smooth content
    (4:2:2 chroma subsampling bounds the difference)."""
    src = SyntheticSource(128, 96, obj_size=32, seed=1, fmt="rgb")
    frame = src.frame_rgb(0)
    yuy2 = jnp.asarray(__import__(
        "gstreamer_vit_tracker_tpu.media.source", fromlist=["rgb_to_yuy2"]
    ).rgb_to_yuy2(frame))
    win = pp.crop_window(jnp.asarray([40.0, 30.0, 32.0, 32.0]), 2.0)
    mean, std = (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
    a = np.asarray(pp.preprocess_yuy2(yuy2, win, 32, mean, std))
    b = np.asarray(pp.preprocess_rgb(jnp.asarray(frame), win, 32, mean, std))
    # Round-trip through YUY2 + chroma subsampling: few-LSB tolerance on
    # smooth content.
    assert np.abs(a - b).mean() < 0.02, np.abs(a - b).mean()


def test_tracks_yuy2_format():
    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    src = SyntheticSource(320, 256, obj_size=48, seed=3, speed=3.0, fmt="yuy2")
    gt0 = src.bbox_at(0)
    st = core.init(params, jnp.asarray(src.frame(0)), jnp.asarray(gt0), CORR,
                   frame_format="yuy2")
    upd = jax.jit(lambda p, s, f: core.update(p, s, f, CORR,
                                              frame_format="yuy2",
                                              use_pallas=False))
    ious = []
    for i in range(1, 21):
        st, bbox, conf = upd(params, st, jnp.asarray(src.frame(i)))
        ious.append(iou(np.asarray(bbox), np.asarray(src.bbox_at(i))))
    assert np.mean(ious) > 0.8, f"mean IoU {np.mean(ious):.3f}"


def test_trackstate_checkpoint_resume(tmp_path):
    """SURVEY.md §5: tracking state is an explicit, save/restorable pytree.
    Saving mid-track and resuming must continue bit-identically."""
    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    src = SyntheticSource(320, 256, obj_size=48, seed=3, speed=3.0)
    st = core.init(params, jnp.asarray(src.frame_rgb(0)),
                   jnp.asarray(src.bbox_at(0)), CORR)
    for i in range(1, 6):
        st, bbox, conf = core.update(params, st, jnp.asarray(src.frame_rgb(i)),
                                     CORR, use_pallas=False)

    path = str(tmp_path / "trackstate")
    weights.save_orbax(path, st._asdict())
    restored = weights.load_orbax(path, st._asdict())
    st2 = type(st)(**restored)

    for leaf_a, leaf_b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))

    # Continue both; identical outputs.
    f = jnp.asarray(src.frame_rgb(6))
    _, b1, c1 = core.update(params, st, f, CORR, use_pallas=False)
    _, b2, c2 = core.update(params, st2, f, CORR, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert float(c1) == float(c2)
