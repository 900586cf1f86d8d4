"""Cross-path bbox parity (the BASELINE.json IoU >= 0.99 harness).

The reference tracker (RKNN blob on an NPU) is not runnable here — no
model file ships with the reference repo and this environment has no
network — so parity is pinned the way SURVEY.md §4 prescribes: the same
synthetic video is tracked through independent input pipelines and the
resulting bboxes must agree:

* RGB path: frames fed as RGB, float32 unfused preprocess;
* NV12 path: the same frames 4:2:0-subsampled, fused Pallas-style
  preprocess (chroma-folded matmuls + BT.601 in the matmul epilogue).

Everything downstream (embedding, correlation, decode, state carry) is
shared, so this isolates exactly the fused-preprocess divergence the
BASELINE configs 1-2 care about.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
from gstreamer_vit_tracker_tpu.models import vittrack
from gstreamer_vit_tracker_tpu.tracker import core

CORR = ModelConfig(template_size=64, search_size=128, patch_size=8,
                   embed_dim=64, depth=0, num_heads=2, head_mode="corr",
                   dtype="float32")


def iou(a, b):
    ix = max(0.0, min(a[0] + a[2], b[0] + b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1]))
    inter = ix * iy
    return inter / (a[2] * a[3] + b[2] * b[3] - inter)


def test_rgb_vs_nv12_bbox_parity():
    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    src_rgb = SyntheticSource(320, 256, obj_size=48, seed=3, speed=3.0)
    src_nv = SyntheticSource(320, 256, obj_size=48, seed=3, speed=3.0,
                             fmt="nv12")
    bb0 = jnp.asarray(src_rgb.bbox_at(0))

    st_rgb = core.init(params, jnp.asarray(src_rgb.frame_rgb(0)), bb0, CORR)
    y0, uv0 = src_nv.frame(0)
    st_nv = core.init(params, (jnp.asarray(y0), jnp.asarray(uv0)), bb0, CORR,
                      frame_format="nv12")

    up_rgb = jax.jit(lambda p, s, f: core.update(p, s, f, CORR,
                                                 use_pallas=False))
    up_nv = jax.jit(lambda p, s, f: core.update(p, s, f, CORR,
                                                frame_format="nv12",
                                                use_pallas=False))
    ious = []
    for i in range(1, 31):
        st_rgb, b_rgb, _ = up_rgb(params, st_rgb, jnp.asarray(src_rgb.frame_rgb(i)))
        y, uv = src_nv.frame(i)
        st_nv, b_nv, _ = up_nv(params, st_nv, (jnp.asarray(y), jnp.asarray(uv)))
        ious.append(iou(np.asarray(b_rgb), np.asarray(b_nv)))
    ious = np.asarray(ious)
    assert ious.min() > 0.9, f"paths diverged: min IoU {ious.min():.3f}"
    assert ious.mean() > 0.99, f"mean IoU {ious.mean():.4f} < 0.99"


def test_bf16_vs_f32_parity():
    """Compute-dtype robustness: bf16 model path tracks within tolerance of
    the f32 path (decode is argmax-based, so bboxes stay aligned)."""
    import dataclasses

    cfg16 = dataclasses.replace(CORR, dtype="bfloat16")
    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    src = SyntheticSource(320, 256, obj_size=48, seed=3, speed=3.0)
    bb0 = jnp.asarray(src.bbox_at(0))

    st32 = core.init(params, jnp.asarray(src.frame_rgb(0)), bb0, CORR)
    st16 = core.init(params, jnp.asarray(src.frame_rgb(0)), bb0, cfg16)
    ious = []
    for i in range(1, 21):
        f = jnp.asarray(src.frame_rgb(i))
        st32, b32, _ = core.update(params, st32, f, CORR, use_pallas=False)
        st16, b16, _ = core.update(params, st16, f, cfg16, use_pallas=False)
        ious.append(iou(np.asarray(b32), np.asarray(b16)))
    assert np.mean(ious) > 0.9, f"bf16 diverged: mean IoU {np.mean(ious):.3f}"
