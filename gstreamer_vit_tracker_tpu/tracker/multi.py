"""Batched tracking: multi-object and multi-stream in one jitted step.

The reference is strictly single-object / single-stream — its only data
parallelism is rayon across image rows (SURVEY.md §2 checklist).  The TPU
analog is *batch* parallelism (BASELINE.json configs 3-4):

* ``update_objects`` — N targets in ONE shared frame (vmap over state);
* ``update_streams`` — S independent streams, each with its own frame and
  M targets, in one batched inference step (vmap over frames and state).

All batched updates donate the state pytree, carry per-slot ``active``
masks (inactive slots keep their state bit-for-bit — masked ``where``, no
divergent control flow), and return packed bbox/score arrays so a 16-stream
step still ships only 16*M*5 floats to the host.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import core
from .state import TrackState

Params = Dict[str, Any]


@functools.lru_cache(maxsize=None)
def _batched_cfg(cfg: ModelConfig) -> ModelConfig:
    """Config for vmapped updates: banding off.

    The band's per-sample ``dynamic_slice`` lowers to a gather under vmap
    (~20 GB/s effective on v5e) — pre-slicing cost more than the smaller
    resample matmuls saved.  Measured on the 16-stream 1080p NV12 step:
    1.774 ms/step banded vs 0.971 ms full-width (docs/ARCHITECTURE.md).
    Banding stays on for the unbatched path, where the slice is a cheap
    contiguous copy.  For frames no larger than the band the two paths are
    numerically identical (the band slice is then a no-op; test-pinned in
    tests/test_parity.py).  When a crop window EXCEEDS the band (a huge
    target, or the lost-ramp expansion on a large frame) they diverge:
    the banded single-object path zero-pads the out-of-band fringe while
    this full-width path samples the real pixels — the batched result is
    the more accurate one."""
    if cfg.preprocess_band is None:
        return cfg
    return dataclasses.replace(cfg, preprocess_band=None)


def _pairwise_iou(b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) xywh -> (N, N) IoU matrix (vector ops, no gathers)."""
    x1, y1 = b[:, 0], b[:, 1]
    x2, y2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    ix = (jnp.minimum(x2[:, None], x2[None, :])
          - jnp.maximum(x1[:, None], x1[None, :]))
    iy = (jnp.minimum(y2[:, None], y2[None, :])
          - jnp.maximum(y1[:, None], y1[None, :]))
    inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)
    area = b[:, 2] * b[:, 3]
    return inter / (area[:, None] + area[None, :] - inter + 1e-9)


def _suppress_duplicates(new: TrackState, old: TrackState,
                         bboxes: jnp.ndarray, scores: jnp.ndarray,
                         active: jnp.ndarray, thr: float
                         ) -> Tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """Exclusive slots: when two slots' boxes collapse onto one target
    (lookalike-crossing identity theft — the measured multi-object failure
    mode, eval_tracking --objects), the lower-confidence duplicate is
    treated as a lost measurement: its bbox reverts to the pre-update box,
    its confidence is zeroed (below the Lost threshold), and lost_frames
    increments — which engages the existing window-freeze + re-detection
    ramp to re-acquire the abandoned target.  Higher confidence wins a
    pair; ties break toward the lower slot index.  All (N,)-vector ops,
    in-jit, no host sync."""
    n = scores.shape[0]
    m = _pairwise_iou(bboxes)
    idx = jnp.arange(n)
    rival_wins = (scores[None, :] > scores[:, None]) | (
        (scores[None, :] == scores[:, None]) & (idx[None, :] < idx[:, None]))
    both = active[:, None] & active[None, :] & (idx[:, None] != idx[None, :])
    loser = ((m > thr) & rival_wins & both).any(axis=1)

    bboxes = jnp.where(loser[:, None], old.bbox, bboxes)
    scores = jnp.where(loser, 0.0, scores)
    new = new._replace(
        bbox=jnp.where(loser[:, None], old.bbox, new.bbox),
        score=jnp.where(loser, 0.0, new.score),
        lost_frames=jnp.where(loser, old.lost_frames + 1, new.lost_frames),
        # The loser's measurement is the RIVAL's target, so an online
        # template update that ran this frame (core.update's
        # _maybe_update_template fires before suppression) would have
        # blended the rival's appearance into the loser's template —
        # poisoning the very re-detection this mechanism enables.  Revert.
        z_tok=jnp.where(loser[:, None, None], old.z_tok, new.z_tok))
    return new, bboxes, scores


def _mask_state(new: TrackState, old: TrackState, active: jnp.ndarray) -> TrackState:
    """Per-slot select: keep ``old`` wherever ``active`` is False."""

    def sel(n, o):
        a = active.reshape(active.shape + (1,) * (n.ndim - active.ndim))
        return jnp.where(a, n, o)

    return jax.tree.map(sel, new, old)


# ---------------------------------------------------------------------------
# Multi-object (one frame, N targets)
# ---------------------------------------------------------------------------

def init_objects(params: Params, frame, bboxes: jnp.ndarray, cfg: ModelConfig,
                 frame_format: str = "rgb") -> TrackState:
    """bboxes (N, 4) -> batched TrackState with leading axis N."""
    fn = functools.partial(core.init, cfg=_batched_cfg(cfg),
                           frame_format=frame_format)
    return jax.vmap(fn, in_axes=(None, None, 0))(params, frame, bboxes)


def update_objects(params: Params, state: TrackState, frame,
                   active: jnp.ndarray, cfg: ModelConfig,
                   frame_format: str = "rgb", exclusive: bool = False
                   ) -> Tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """One frame, N targets.  active: (N,) bool.  Returns
    (state, bboxes (N,4), scores (N,)).

    ``exclusive`` enables cross-slot duplicate suppression (see
    :func:`_suppress_duplicates`): slots sharing one frame refuse to
    collapse onto the same target after a lookalike crossing."""
    # fused=False: under this vmap the physical batch is N, where the
    # per-sample fused ViT kernel loses to XLA's batched GEMMs.
    fn = functools.partial(core.update, cfg=_batched_cfg(cfg),
                           frame_format=frame_format,
                           fused=False)
    new_state, bboxes, scores = jax.vmap(fn, in_axes=(None, 0, None))(
        params, state, frame)
    new_state = _mask_state(new_state, state, active)
    bboxes = jnp.where(active[:, None], bboxes, state.bbox)
    scores = jnp.where(active, scores, state.score)
    if exclusive:
        new_state, bboxes, scores = _suppress_duplicates(
            new_state, state, bboxes, scores, active,
            cfg.exclusive_overlap_threshold)
    return new_state, bboxes, scores


# ---------------------------------------------------------------------------
# Multi-stream (S frames, M targets each)
# ---------------------------------------------------------------------------

def init_streams(params: Params, frames, bboxes: jnp.ndarray, cfg: ModelConfig,
                 frame_format: str = "rgb") -> TrackState:
    """frames batched on axis 0 (S, ...); bboxes (S, M, 4)."""
    fn = functools.partial(init_objects, cfg=cfg, frame_format=frame_format)
    return jax.vmap(fn, in_axes=(None, 0, 0))(params, frames, bboxes)


def update_streams(params: Params, state: TrackState, frames,
                   active: jnp.ndarray, cfg: ModelConfig,
                   frame_format: str = "rgb", exclusive: bool = False
                   ) -> Tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """S streams x M targets in one step.  frames batched on axis 0;
    active (S, M) bool.  Returns (state, bboxes (S,M,4), scores (S,M)).
    ``exclusive`` suppresses duplicate locks per stream (objects sharing a
    frame; slots in different streams never interact)."""
    fn = functools.partial(core.update, cfg=_batched_cfg(cfg),
                           frame_format=frame_format,
                           fused=False)   # physical batch = S x M (see above)
    inner = jax.vmap(fn, in_axes=(None, 0, None))        # over objects
    outer = jax.vmap(inner, in_axes=(None, 0, 0))        # over streams
    new_state, bboxes, scores = outer(params, state, frames)
    new_state = _mask_state(new_state, state, active)
    bboxes = jnp.where(active[..., None], bboxes, state.bbox)
    scores = jnp.where(active, scores, state.score)
    if exclusive:
        thr = cfg.exclusive_overlap_threshold
        new_state, bboxes, scores = jax.vmap(
            functools.partial(_suppress_duplicates, thr=thr)
        )(new_state, state, bboxes, scores, active)
    return new_state, bboxes, scores


# ---------------------------------------------------------------------------
# Jitted entry points (donated state)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "frame_format"))
def init_objects_jit(params, frame, bboxes, cfg: ModelConfig,
                     frame_format: str = "rgb"):
    """Jitted batched init: the eager vmap init dispatches every op
    separately (seconds of startup on a relay-attached device) and can
    alias caller buffers into the state; one compiled program does
    neither."""
    return init_objects(params, frame, bboxes, cfg, frame_format)


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format"))
def init_streams_jit(params, frames, bboxes, cfg: ModelConfig,
                     frame_format: str = "rgb"):
    return init_streams(params, frames, bboxes, cfg, frame_format)


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format",
                                             "exclusive"),
                   donate_argnums=(1,))
def update_objects_jit(params, state, frame, active, cfg: ModelConfig,
                       frame_format: str = "rgb", exclusive: bool = False):
    return update_objects(params, state, frame, active, cfg, frame_format,
                          exclusive)


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format",
                                             "exclusive"),
                   donate_argnums=(1,))
def update_streams_jit(params, state, frames, active, cfg: ModelConfig,
                       frame_format: str = "rgb", exclusive: bool = False):
    return update_streams(params, state, frames, active, cfg, frame_format,
                          exclusive)
