"""Parity: the one-kernel NV12 preprocess+patch-embed (ops/fused_prep_embed)
matches the plain chain preprocess_nv12 -> embed_search, and the tracker
step routed through it tracks identically.

The kernel runs in interpret mode on CPU only — on the real TPU Mosaic
cannot lower the patchify (merge-into-lane reshape; module docstring), so
``nv12_search_tokens`` raises there instead of emitting a cryptic compile
error.  These tests pin both the interpret-mode numerics (the layout spec
for a future hand-written kernel) and the TPU-backend refusal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.media.source import (SyntheticSource,
                                                    rgb_to_nv12_planes)
from gstreamer_vit_tracker_tpu.models import vit, vittrack
from gstreamer_vit_tracker_tpu.ops import fused_prep_embed as fpe
from gstreamer_vit_tracker_tpu.ops import preprocess as pp

CFG = ModelConfig(dtype="float32")


def _nv12(shape=(512, 640), seed=0):
    rng = np.random.default_rng(seed)
    frame = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
    y, uv = rgb_to_nv12_planes(frame)
    return jnp.asarray(y), jnp.asarray(uv)


def _ref_tokens(params, y, uv, win, cfg, dtype):
    x_img = pp.preprocess_nv12(y, uv, win, cfg.search_size, cfg.norm_mean,
                               cfg.norm_std, dtype=dtype,
                               band=cfg.preprocess_band)
    return vit.embed_search(params["backbone"], x_img[None], cfg)[0]


def test_raises_on_real_tpu_backend(monkeypatch):
    """On the TPU backend the kernel refuses with a clear message (Mosaic
    can't lower the patchify); GVT_FUSED_PREP_FORCE=1 re-probes."""
    params = vittrack.init_params(jax.random.PRNGKey(0), CFG)
    y, uv = _nv12()
    win = pp.CropWindow(cx=300.0, cy=250.0, size=200.0)
    monkeypatch.delenv("GVT_FUSED_PREP_FORCE", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(NotImplementedError, match="Mosaic"):
        fpe.nv12_search_tokens(params, y, uv, win, CFG)


@pytest.mark.parametrize("mode", ["transpose", "loop"])
def test_matches_plain_chain_f32(mode):
    params = vittrack.init_params(jax.random.PRNGKey(0), CFG)
    y, uv = _nv12()
    win = pp.crop_window(jnp.asarray([300.0, 200.0, 64.0, 64.0]),
                         CFG.search_factor)
    ref = _ref_tokens(params, y, uv, win, CFG, jnp.float32)
    tok = fpe.nv12_search_tokens(params, y, uv, win, CFG, mode=mode)
    np.testing.assert_allclose(np.asarray(tok), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("mode", ["transpose", "loop"])
def test_zero_padding_at_frame_edge(mode):
    """Window hanging off the frame: padding decodes to black -> identical
    tokens (the offset-before-resample contract)."""
    params = vittrack.init_params(jax.random.PRNGKey(1), CFG)
    y, uv = _nv12(seed=1)
    win = pp.crop_window(jnp.asarray([-20.0, 470.0, 80.0, 80.0]),
                         CFG.search_factor)
    ref = _ref_tokens(params, y, uv, win, CFG, jnp.float32)
    tok = fpe.nv12_search_tokens(params, y, uv, win, CFG, mode=mode)
    np.testing.assert_allclose(np.asarray(tok), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_banded_1080p_matches():
    """Frame larger than the band: the fused path must band identically."""
    params = vittrack.init_params(jax.random.PRNGKey(2), CFG)
    y, uv = _nv12(shape=(1080, 1920), seed=2)
    win = pp.crop_window(jnp.asarray([1500.0, 700.0, 64.0, 64.0]),
                         CFG.search_factor)
    assert CFG.preprocess_band is not None and 1920 > CFG.preprocess_band
    ref = _ref_tokens(params, y, uv, win, CFG, jnp.float32)
    tok = fpe.nv12_search_tokens(params, y, uv, win, CFG, mode="loop")
    np.testing.assert_allclose(np.asarray(tok), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_bf16_close_to_plain_bf16():
    cfg = ModelConfig()          # bf16 serving default (params stay f32;
    params = vittrack.init_params(  # compute casts at use, CLAUDE.md)
        jax.random.PRNGKey(3), cfg)
    y, uv = _nv12(seed=3)
    win = pp.crop_window(jnp.asarray([260.0, 180.0, 72.0, 72.0]),
                         cfg.search_factor)
    ref = _ref_tokens(params, y, uv, win, cfg, jnp.bfloat16)
    tok = fpe.nv12_search_tokens(params, y, uv, win, cfg, mode="loop")
    np.testing.assert_allclose(
        np.asarray(tok, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        atol=0.05, rtol=0.05)


def test_tracker_update_fused_prep_parity():
    """core.update(fused_prep=True) tracks the same target to the same
    bbox/confidence as the plain step."""
    from gstreamer_vit_tracker_tpu.tracker import core

    params = vittrack.init_params(jax.random.PRNGKey(4), CFG)
    src = SyntheticSource(320, 256, obj_size=56, seed=2, fmt="nv12")
    y0, uv0 = src.frame(0)
    st = core.init(params, (jnp.asarray(y0), jnp.asarray(uv0)),
                   jnp.asarray(src.bbox_at(0)), CFG, frame_format="nv12")
    st2 = jax.tree.map(jnp.copy, st)
    upd_plain = jax.jit(lambda p, s, f: core.update(
        p, s, f, CFG, frame_format="nv12", use_pallas=False, fused=False))
    upd_fused = jax.jit(lambda p, s, f: core.update(
        p, s, f, CFG, frame_format="nv12", use_pallas=False, fused=False,
        fused_prep=True))
    for i in range(1, 6):
        y, uv = src.frame(i)
        fr = (jnp.asarray(y), jnp.asarray(uv))
        st, bb_a, c_a = upd_plain(params, st, fr)
        st2, bb_b, c_b = upd_fused(params, st2, fr)
        np.testing.assert_allclose(np.asarray(bb_a), np.asarray(bb_b),
                                   atol=0.25)
        np.testing.assert_allclose(float(c_a), float(c_b), atol=0.02)
