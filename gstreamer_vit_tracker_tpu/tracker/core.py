"""Functional tracker core: ``init(frame, bbox) -> TrackState`` and
``update(TrackState, frame) -> (TrackState, bbox, score)``.

This is the TPU-native re-design of the external ``vit_tracker`` crate's
``VitTrack::{init, update}`` API observed at
/root/reference/src/tracker_context.rs:88-94,120-123 (SURVEY.md §2.9).
Everything between "frame bytes in HBM" and "4-float bbox + score out" is
one jitted XLA program:

    fused crop/resize/normalise (MXU matmuls)
      -> patch embed -> joint ViT encode (Pallas flash attention)
      -> score/offset/size heads -> hanning-penalty decode -> bbox

The update step donates ``TrackState`` so template tokens never leave HBM;
the host receives only the 4-float bbox and the confidence scalar.

Frames may be RGB (H, W, 3) uint8 or NV12 planes (the production path);
both adapters share the same core.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models import heads as heads_mod
from ..models import vittrack
from ..ops import preprocess as pp
from .state import TrackState

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Frame adapters
# ---------------------------------------------------------------------------

def _prep_dtype(cfg: ModelConfig):
    """Preprocess in the model's compute dtype: bf16 resampling halves the
    band-buffer traffic and doubles MXU rate; pixel integers (<=255) are
    exactly representable in bf16 and the bf16-vs-f32 tracking parity is
    test-pinned (tests/test_parity.py)."""
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _prep_rgb(frame, window, out_size: int, cfg: ModelConfig,
              patch_major=None):
    return pp.preprocess_rgb(frame, window, out_size, cfg.norm_mean,
                             cfg.norm_std, dtype=_prep_dtype(cfg),
                             band=cfg.preprocess_band,
                             patch_major=patch_major)


def _prep_nv12(frame, window, out_size: int, cfg: ModelConfig,
               patch_major=None):
    y_plane, uv_plane = frame
    return pp.preprocess_nv12(y_plane, uv_plane, window, out_size,
                              cfg.norm_mean, cfg.norm_std,
                              dtype=_prep_dtype(cfg),
                              band=cfg.preprocess_band,
                              patch_major=patch_major)


def _prep_yuy2(frame, window, out_size: int, cfg: ModelConfig,
               patch_major=None):
    # frame: (H, W*2) packed YUY2 rows.
    return pp.preprocess_yuy2(frame, window, out_size, cfg.norm_mean,
                              cfg.norm_std, dtype=_prep_dtype(cfg),
                              band=cfg.preprocess_band,
                              patch_major=patch_major)


_PREPS: Dict[str, Callable] = {"rgb": _prep_rgb, "nv12": _prep_nv12,
                               "yuy2": _prep_yuy2}


def frame_shape(frame, frame_format: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if frame_format == "rgb":
        return frame.shape[0], frame.shape[1]
    if frame_format == "yuy2":
        return frame.shape[0], frame.shape[1] // 2
    return frame[0].shape[0], frame[0].shape[1]


# ---------------------------------------------------------------------------
# Core (unbatched; vmap adds object/stream axes — tracker/multi.py)
# ---------------------------------------------------------------------------

def init(params: Params, frame, bbox: jnp.ndarray, cfg: ModelConfig,
         frame_format: str = "rgb") -> TrackState:
    """Capture the template and start a track.

    ``bbox`` = (x, y, w, h) in frame pixels (float32 or int).  Mirrors
    ``tracker.init(full_image, bbox)`` (tracker_context.rs:88).
    """
    prep = _PREPS[frame_format]
    bbox = jnp.asarray(bbox, jnp.float32)
    window = pp.crop_window(bbox, cfg.template_factor)
    z_img = prep(frame, window, cfg.template_size, cfg)
    z_tok = vittrack.embed_template(params, z_img[None], cfg)[0]
    return TrackState(
        z_tok=z_tok,
        # Distinct buffer (not an alias of z_tok): donated updates would
        # otherwise donate one buffer twice ("donate(a), donate(a)").
        z_tok_init=jnp.copy(z_tok),
        # Fresh buffer: with an eager (non-jit) init, asarray on an
        # already-f32 bbox is the identity, so the state would alias the
        # caller's array — the first donated update would then delete the
        # caller's bbox out from under any later re-init with it.
        bbox=jnp.copy(bbox),
        score=jnp.ones((), jnp.float32),
        frame_idx=jnp.zeros((), jnp.int32),
        lost_frames=jnp.zeros((), jnp.int32),
    )


def update(params: Params, state: TrackState, frame, cfg: ModelConfig,
           frame_format: str = "rgb",
           use_pallas: bool | None = None,
           fused: bool | None = None,
           fused_embed: bool = False,
           fused_prep: bool | str = False) -> Tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """Track one frame.  Returns (new_state, bbox_xywh, confidence).

    Mirrors ``tracker.update(full_image) -> TrackResult{bbox, score,
    success}`` (tracker_context.rs:120-123); "success" is implicit — the
    returned confidence is always finite and the session machine applies
    the 0.25 threshold.

    ``fused`` gates the fused per-block ViT kernel (models/vit.py::encode);
    batched callers (tracker/multi.py) pass False — under their vmap the
    traced batch is 1 but the physical batch is the stream/object count,
    where the fused per-sample grid loses to XLA's batched GEMMs.

    ``fused_embed`` routes preprocessing through the patch-major crop +
    relayout-free embed (models/vit.py::embed_search_patches).  Opt-in:
    the first formulation (p-batched dot) measured SLOWER than the plain
    path (prep+embed 0.070 vs 0.040 ms); the current flat-contraction
    variant is unproven until a healthy-window A/B says otherwise.
    """
    prep = _PREPS[frame_format]
    fh, fw = frame_shape(frame, frame_format)

    # Re-detection ramp: while confidence has been below the freeze
    # threshold the search window grows geometrically (capped), matching
    # the physics of a target drifting away from where it vanished — an
    # occluded target reappears OUTSIDE a fixed-size window after enough
    # frames.  lost_frames==0 (the normal case) leaves the factor exact.
    factor = cfg.search_factor
    if cfg.lost_window_growth > 1.0:
        expand = jnp.minimum(
            cfg.lost_window_growth ** state.lost_frames.astype(jnp.float32),
            cfg.lost_window_max_growth)
        factor = cfg.search_factor * expand
    window = pp.crop_window(state.bbox, factor)
    if cfg.preprocess_band is not None and cfg.lost_window_growth > 1.0:
        # The banded preprocess zero-fades everything outside the static
        # band; a ramped re-detection window larger than the band would
        # "search" pixels that are actually zeros.  Clamp the grown window
        # to the band so the ramp only ever reaches real pixels (the
        # normal-tracking window is sized to fit the band by construction).
        window = window._replace(
            size=jnp.minimum(window.size, float(cfg.preprocess_band)))
    if fused_prep and frame_format == "nv12":
        # Whole preprocess + patch-embed in ONE Pallas kernel
        # (ops/fused_prep_embed.py).  Interpret-mode/spec only: real-TPU
        # Mosaic cannot lower the patchify (the module raises there — see
        # its docstring).  True selects the default patchify formulation;
        # a string ("loop" / "transpose") pins one for A/B harnesses.
        from ..ops import fused_prep_embed as fpe

        mode = fused_prep if isinstance(fused_prep, str) else "loop"
        y_plane, uv_plane = frame
        x_tok = fpe.nv12_search_tokens(params, y_plane, uv_plane, window,
                                       cfg, mode=mode)[None]
        maps = vittrack.forward_tokens(params, state.z_tok[None], x_tok, cfg,
                                       use_pallas=use_pallas, fused=fused)
    elif fused_embed:
        patches = prep(frame, window, cfg.search_size, cfg,
                       patch_major=cfg.patch_size)
        x_tok = vittrack.embed_search_patches(params, patches, cfg)[None]
        maps = vittrack.forward_tokens(params, state.z_tok[None], x_tok, cfg,
                                       use_pallas=use_pallas, fused=fused)
    else:
        x_img = prep(frame, window, cfg.search_size, cfg)
        maps = vittrack.forward(params, state.z_tok[None], x_img[None], cfg,
                                use_pallas=use_pallas, fused=fused)

    hann = heads_mod.hanning_2d(cfg.feat_size, cfg.hann_mode)
    prev_size_norm = state.bbox[2:4] / window.size
    bbox_norm, conf = heads_mod.decode_maps(
        maps.score[0], maps.offset[0], maps.size[0], hann, prev_size_norm)

    # Map crop-normalised (cx, cy, w, h) back to frame pixels — as (2,)
    # vector ops, not per-scalar ops (each scalar op is its own tiny TPU
    # kernel; the decode+state tail measured 0.075 ms/step before this,
    # scripts/profile_scan.py).
    lim = jnp.asarray([fw, fh], jnp.float32)
    origin = jnp.stack([window.cx, window.cy]) - 0.5 * window.size
    cxy = origin + bbox_norm[0:2] * window.size
    wh = jnp.clip(bbox_norm[2:4] * window.size, 1.0, lim)
    if cfg.size_rate_limit > 0.0:
        # Physical-plausibility clamp on per-frame size change
        # (config.py::size_rate_limit).  Periodic textures (lattices,
        # fences, halftones) correlate at many shifts, so the size head
        # can read "object everywhere" and enter a window-growth feedback
        # loop (measured on the independent eval world: 48 px -> 294 px
        # in ~20 frames, then confidently tracking the lattice).  Real
        # targets never grow 25%/frame — the in-family 0.5x-2x scale
        # sweep peaks at ~1.5%/frame — so the clamp only bites on
        # pathology.
        r = 1.0 + cfg.size_rate_limit
        wh = jnp.clip(wh, state.bbox[2:4] / r, state.bbox[2:4] * r)
    if cfg.size_conf_freeze > 0.0:
        # Half-confident frames update position only; the size head's
        # output is unreliable exactly when the score map is ambiguous
        # (config.py::size_conf_freeze — the other half of the
        # lattice-balloon fix above).
        wh = jnp.where(conf > cfg.size_conf_freeze, wh, state.bbox[2:4])
    xy = jnp.clip(cxy - 0.5 * wh, 0.0, lim - wh)
    new_bbox = jnp.concatenate([xy, wh])
    if cfg.window_freeze_threshold > 0.0:
        # Low confidence (target hidden/lost): hold the previous bbox so
        # the search window stays where the target vanished — decoded
        # peaks of a noise map would walk it away and make re-acquisition
        # impossible (config.py::window_freeze_threshold).
        new_bbox = jnp.where(conf > cfg.window_freeze_threshold,
                             new_bbox, state.bbox)

    confident = conf > cfg.window_freeze_threshold
    new_state = TrackState(
        z_tok=state.z_tok,
        z_tok_init=state.z_tok_init,
        bbox=new_bbox,
        score=conf,
        frame_idx=state.frame_idx + 1,
        lost_frames=jnp.where(confident, 0, state.lost_frames + 1),
    )

    if cfg.template_update_enabled:
        new_state = _maybe_update_template(params, new_state, frame, cfg, prep)

    return new_state, new_bbox, conf


def _maybe_update_template(params: Params, state: TrackState, frame,
                           cfg: ModelConfig, prep) -> TrackState:
    """Online template update (BASELINE.json config 3): on a confident frame
    at the configured interval, re-embed the template at the current bbox
    and blend it with the *initial* template.

    Implemented with masked ``where`` (not ``cond``) so it stays correct
    under vmap with per-object divergence (SURVEY.md §7 hard part (d));
    the extra patch-embed is one small matmul.
    """
    do = jnp.logical_and(
        state.score > cfg.template_update_threshold,
        (state.frame_idx % cfg.template_update_interval) == 0,
    )
    window = pp.crop_window(state.bbox, cfg.template_factor)
    z_img = prep(frame, window, cfg.template_size, cfg)
    z_new = vittrack.embed_template(params, z_img[None], cfg)[0]
    a = cfg.template_update_anchor
    blended = (a * state.z_tok_init.astype(jnp.float32)
               + (1.0 - a) * z_new.astype(jnp.float32)).astype(state.z_tok.dtype)
    return state._replace(z_tok=jnp.where(do, blended, state.z_tok))


# ---------------------------------------------------------------------------
# Jitted single-object entry points (donated state => HBM-resident carry)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "frame_format"))
def init_jit(params, frame, bbox, cfg: ModelConfig, frame_format: str = "rgb"):
    return init(params, frame, bbox, cfg, frame_format)


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format"),
                   donate_argnums=(1,))
def update_jit(params, state: TrackState, frame, cfg: ModelConfig,
               frame_format: str = "rgb"):
    return update(params, state, frame, cfg, frame_format)


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format"),
                   donate_argnums=(1,))
def update_packed_jit(params, state: TrackState, frame, cfg: ModelConfig,
                      frame_format: str = "rgb"):
    """Like :func:`update_jit` but returns (state, packed) where ``packed``
    = [x, y, w, h, score] in ONE device array — a single host fetch per
    frame.  On remote-attached TPUs every synchronous device->host read is
    a full round trip, so the 5 scalars the reference reads per frame
    (bbox + score, tracker_context.rs:120-123) must travel together."""
    new_state, bbox, conf = update(params, state, frame, cfg, frame_format)
    return new_state, jnp.concatenate([bbox, conf[None]])
