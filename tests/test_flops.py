"""Static FLOP accounting (utils/flops.py) validated against XLA's own
cost analysis of the REAL compiled update program — the analytic count
must be the matmul/conv share of the total (elementwise excluded), not a
number that drifted from the implementation."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.models import vittrack
from gstreamer_vit_tracker_tpu.tracker import core
from gstreamer_vit_tracker_tpu.utils import flops


def _xla_update_flops(cfg, h, w, fmt):
    params = vittrack.with_grouped_head(
        vittrack.init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    if fmt == "nv12":
        frame = (jnp.asarray(rng.integers(0, 256, (h, w), np.uint8)),
                 jnp.asarray(rng.integers(0, 256, (h // 2, w // 2, 2),
                                          np.uint8)))
    else:
        frame = jnp.asarray(rng.integers(0, 256, (h, w, 3), np.uint8))
    bbox = jnp.asarray([w * 0.4, h * 0.4, w * 0.1, h * 0.08])
    state = core.init(params, frame, bbox, cfg, frame_format=fmt)
    fn = functools.partial(core.update, cfg=cfg, frame_format=fmt)
    ca = jax.jit(fn).lower(params, state, frame).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


@pytest.mark.slow
def test_flagship_gflop_vs_xla_cost_analysis():
    """The published gflop_per_frame must be the dominant share of XLA's
    total for the flagship 1080p NV12 program: everything NOT counted is
    elementwise epilogue (~9% measured when this pin was written)."""
    cfg = ModelConfig()
    analytic = flops.update_gflops(cfg, 1080, 1920, "nv12",
                                   grouped_head=True) * 1e9
    xla = _xla_update_flops(cfg, 1080, 1920, "nv12")
    assert analytic <= xla * 1.001          # never overcount
    assert analytic >= 0.80 * xla           # never drift into undercount


def test_small_config_gflop_vs_xla_cost_analysis():
    """Same pin at a tiny config (fast tier): formulas must track the
    implementation across shapes, not just at flagship dims."""
    cfg = ModelConfig(template_size=32, search_size=64, patch_size=16,
                      embed_dim=32, depth=2, num_heads=2, dtype="float32",
                      preprocess_band=None)
    analytic = flops.update_gflops(cfg, 96, 128, "nv12",
                                   grouped_head=True) * 1e9
    xla = _xla_update_flops(cfg, 96, 128, "nv12")
    assert analytic <= xla * 1.001
    # Tiny shapes have a larger elementwise share; looser floor.
    assert analytic >= 0.5 * xla


def test_mfu_fields_shape():
    f = flops.mfu_fields(6487.5, 6.168)
    assert f["achieved_tflops"] == pytest.approx(40.02, abs=0.02)
    assert f["mfu_vs_v5e_bf16"] == pytest.approx(0.2031, abs=0.001)
    g = flops.mfu_fields(1000.0, 2.0, prefix="stream_")
    assert set(g) == {"stream_gflop_per_frame", "stream_achieved_tflops",
                      "stream_mfu_vs_v5e_bf16"}


def test_preprocess_band_caps_cost():
    """Banding is the reason 4K preprocess costs ~the same as 1080p:
    the counter must reflect it (both capped at band=1152 rows)."""
    cfg = ModelConfig()
    f1080 = flops.preprocess_flops(cfg, 1080, 1920, "nv12")
    f4k = flops.preprocess_flops(cfg, 2160, 3840, "nv12")
    assert f4k < 1.2 * f1080
