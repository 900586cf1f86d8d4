"""Fused preprocess + patch-embed (the relayout-free search path).

``preprocess_*(..., patch_major=p)`` emits the search crop pre-grouped per
patch row via a row-permuted sampling matrix (ops/preprocess.py), and
``vit.embed_search_patches`` contracts it with the patch kernel as a
p-batched matmul — replacing the 6-D transpose + big matmul of the
standard path.  These tests pin that the fused path is a pure layout
optimisation: same pixel values, same tokens (up to f32 accumulation
order), same tracks.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
from gstreamer_vit_tracker_tpu.models import vit, vittrack
from gstreamer_vit_tracker_tpu.ops import preprocess as pp
from gstreamer_vit_tracker_tpu.tracker import core

CFG = ModelConfig(template_size=32, search_size=64, patch_size=8,
                  embed_dim=32, depth=1, num_heads=2, head_mode="conv",
                  dtype="float32", preprocess_band=None)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _patchify_ref(crop: np.ndarray, patch: int) -> np.ndarray:
    """Reference patch-major grouping of a standard (S, S, 3) crop."""
    s = crop.shape[0]
    g = s // patch
    x = crop.reshape(g, patch, g, patch, 3)
    return x.transpose(1, 0, 2, 3, 4).reshape(patch, g * g, patch * 3)


def test_patch_major_rgb_matches_standard(rng):
    img = jnp.asarray(rng.integers(0, 256, (90, 120, 3), dtype=np.uint8))
    win = pp.crop_window(jnp.asarray([40.0, 30.0, 24.0, 18.0]), 4.0)
    mean, std = CFG.norm_mean, CFG.norm_std
    std_out = np.asarray(pp.preprocess_rgb(img, win, 64, mean, std))
    pm = np.asarray(pp.preprocess_rgb(img, win, 64, mean, std, patch_major=8))
    assert pm.shape == (8, 64, 24)
    np.testing.assert_allclose(pm, _patchify_ref(std_out, 8),
                               rtol=1e-5, atol=1e-5)


def test_patch_major_nv12_matches_standard(rng):
    y = jnp.asarray(rng.integers(16, 236, (90, 120), dtype=np.uint8))
    uv = jnp.asarray(rng.integers(16, 241, (45, 60, 2), dtype=np.uint8))
    win = pp.crop_window(jnp.asarray([50.0, 40.0, 20.0, 20.0]), 4.0)
    mean, std = CFG.norm_mean, CFG.norm_std
    std_out = np.asarray(pp.preprocess_nv12(y, uv, win, 64, mean, std))
    pm = np.asarray(pp.preprocess_nv12(y, uv, win, 64, mean, std,
                                       patch_major=8))
    np.testing.assert_allclose(pm, _patchify_ref(std_out, 8),
                               rtol=1e-5, atol=1e-5)


def test_patch_major_yuy2_matches_standard(rng):
    yuy2 = jnp.asarray(rng.integers(16, 236, (90, 240), dtype=np.uint8))
    win = pp.crop_window(jnp.asarray([50.0, 40.0, 20.0, 20.0]), 4.0)
    mean, std = CFG.norm_mean, CFG.norm_std
    std_out = np.asarray(pp.preprocess_yuy2(yuy2, win, 64, mean, std))
    pm = np.asarray(pp.preprocess_yuy2(yuy2, win, 64, mean, std,
                                       patch_major=8))
    np.testing.assert_allclose(pm, _patchify_ref(std_out, 8),
                               rtol=1e-5, atol=1e-5)


def test_patch_major_respects_banding(rng):
    """The band slice composes with patch-major output exactly as with the
    standard output (same slice, permuted rows)."""
    y = jnp.asarray(rng.integers(16, 236, (200, 300), dtype=np.uint8))
    uv = jnp.asarray(rng.integers(16, 241, (100, 150, 2), dtype=np.uint8))
    win = pp.crop_window(jnp.asarray([120.0, 90.0, 30.0, 30.0]), 4.0)
    mean, std = CFG.norm_mean, CFG.norm_std
    banded = np.asarray(pp.preprocess_nv12(y, uv, win, 64, mean, std,
                                           band=160, patch_major=8))
    full = np.asarray(pp.preprocess_nv12(y, uv, win, 64, mean, std,
                                         patch_major=8))
    np.testing.assert_allclose(banded, full, rtol=1e-4, atol=1e-4)


def test_embed_search_patches_matches_embed_search(rng):
    """Token parity: the p-batched contraction equals the transpose + matmul
    embed up to f32 accumulation order."""
    params = vittrack.init_params(jax.random.PRNGKey(0), CFG)["backbone"]
    img = jnp.asarray(rng.integers(0, 256, (90, 120, 3), dtype=np.uint8))
    win = pp.crop_window(jnp.asarray([40.0, 30.0, 24.0, 18.0]), 4.0)
    crop = pp.preprocess_rgb(img, win, CFG.search_size, CFG.norm_mean,
                             CFG.norm_std)
    patches = pp.preprocess_rgb(img, win, CFG.search_size, CFG.norm_mean,
                                CFG.norm_std, patch_major=CFG.patch_size)
    ref = np.asarray(vit.embed_search(params, crop[None], CFG)[0])
    got = np.asarray(vit.embed_search_patches(params, patches, CFG))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_update_fused_embed_tracks_like_unfused():
    """End-to-end: the fused-embed serving path and the fused=False path
    produce near-identical tracks on the same sequence."""
    params = vittrack.init_params(jax.random.PRNGKey(3), CFG)
    src = SyntheticSource(200, 160, obj_size=32, seed=5, speed=2.0)
    bb0 = jnp.asarray(src.bbox_at(0))
    frame0 = jnp.asarray(src.frame_rgb(0))
    st_a = core.init(params, frame0, bb0, CFG)
    st_b = core.init(params, frame0, bb0, CFG)

    up_fused = jax.jit(lambda p, s, f: core.update(p, s, f, CFG,
                                                   use_pallas=False,
                                                   fused_embed=True))
    up_plain = jax.jit(lambda p, s, f: core.update(p, s, f, CFG,
                                                   use_pallas=False,
                                                   fused=False))
    for i in range(1, 11):
        fr = jnp.asarray(src.frame_rgb(i))
        st_a, b_a, c_a = up_fused(params, st_a, fr)
        st_b, b_b, c_b = up_plain(params, st_b, fr)
        np.testing.assert_allclose(np.asarray(b_a), np.asarray(b_b),
                                   atol=1.5)
        assert abs(float(c_a) - float(c_b)) < 0.02


def test_patch_major_bf16(rng):
    """bf16 patch-major path stays within bf16 tolerance of the standard
    bf16 crop (serving dtype)."""
    cfg16 = dataclasses.replace(CFG, dtype="bfloat16")
    y = jnp.asarray(rng.integers(16, 236, (90, 120), dtype=np.uint8))
    uv = jnp.asarray(rng.integers(16, 241, (45, 60, 2), dtype=np.uint8))
    win = pp.crop_window(jnp.asarray([50.0, 40.0, 20.0, 20.0]), 4.0)
    std_out = np.asarray(pp.preprocess_nv12(
        y, uv, win, 64, cfg16.norm_mean, cfg16.norm_std,
        dtype=jnp.bfloat16).astype(jnp.float32))
    pm = np.asarray(pp.preprocess_nv12(
        y, uv, win, 64, cfg16.norm_mean, cfg16.norm_std,
        dtype=jnp.bfloat16, patch_major=8).astype(jnp.float32))
    np.testing.assert_allclose(pm, _patchify_ref(std_out, 8),
                               rtol=0.05, atol=0.05)
