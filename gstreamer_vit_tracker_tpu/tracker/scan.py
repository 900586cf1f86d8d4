"""Sequence tracking as ONE XLA program (``lax.scan`` over frames).

The per-frame Python dispatch loop pays a host round trip per frame; for
offline video, bulk serving, and benchmarking, the whole frame sequence
can run as a single scanned program: state threads through the scan
carry (never leaving HBM), and the per-frame bboxes/scores come back as
one stacked array — a single host fetch for N frames.

This is the TPU analog of the reference's pipelined media path (frames
flow through GStreamer-owned threads, the host only observes telemetry,
pipeline_ir.rs:100-228) taken to its limit: the "pipeline" is the XLA
program itself.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import core
from .state import TrackState

Params = Dict[str, Any]


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format"),
                   donate_argnums=(1,))
def update_scan(params: Params, state: TrackState, frames, cfg: ModelConfig,
                frame_format: str = "rgb"
                ) -> Tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """Track a whole clip.  ``frames``: RGB (N, H, W, 3) or NV12 planes
    ((N, H, W), (N, H/2, W/2, 2)) or YUY2 (N, H, W*2).

    Returns (final_state, bboxes (N, 4), scores (N,)).
    """

    def body(st, frame):
        st, bbox, conf = core.update(params, st, frame, cfg, frame_format)
        return st, (bbox, conf)

    # NV12 frames arrive as a tuple of stacked planes; lax.scan slices
    # pytree leaves elementwise, so both layouts scan directly.
    state, (bboxes, scores) = jax.lax.scan(body, state, frames)
    return state, bboxes, scores


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format", "reps",
                                             "fused_prep"),
                   donate_argnums=(1,))
def update_scan_pool(params: Params, state: TrackState, frames, reps: int,
                     cfg: ModelConfig, frame_format: str = "nv12",
                     fused_prep: bool | str = False
                     ) -> Tuple[TrackState, jnp.ndarray]:
    """Benchmark variant: ``reps`` tracked frames cycling through a small
    HBM-resident frame pool by index (no per-frame host involvement at
    all).  Returns (state, scores (reps,)).  ``fused_prep`` routes the
    NV12 step through the one-kernel preprocess+embed (core.update)."""
    if frame_format == "nv12":
        pool = frames[0].shape[0]

        def pick(i):
            return (frames[0][i % pool], frames[1][i % pool])
    else:
        pool = frames.shape[0]

        def pick(i):
            return frames[i % pool]

    def body(st, i):
        st, _bbox, conf = core.update(params, st, pick(i), cfg, frame_format,
                                      fused_prep=fused_prep)
        return st, conf

    state, scores = jax.lax.scan(body, state, jnp.arange(reps))
    return state, scores


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format", "reps"),
                   donate_argnums=(1,))
def update_streams_scan_pool(params: Params, state: TrackState, frames,
                             active: jnp.ndarray, reps: int, cfg: ModelConfig,
                             frame_format: str = "nv12"
                             ) -> Tuple[TrackState, jnp.ndarray]:
    """``reps`` batched multi-stream steps as ONE scanned XLA program.

    The bulk-serving shape for BASELINE config 4: S independent streams
    advance together, each stream s reading pool frame ``(i + s) % P`` so
    content differs across streams without duplicating the pool in HBM.
    ``state`` is a (S, M)-leading TrackState from multi.init_streams;
    ``active`` (S, M) bool is constant across the scan.  Returns (state,
    scores (reps, S, M)) — one host fetch for the whole run.

    The per-step frame pick is a CONTIGUOUS ``dynamic_slice`` into a
    cyclically-extended pool (built once per call, hoisted out of the
    scan), not a row gather: a 16-row gather of 1080p uint8 planes ran at
    ~20 GB/s effective on v5e (2.5 ms/step); the contiguous slice runs at
    full HBM rate (scripts/profile_scan.py, docs/ARCHITECTURE.md).
    """
    from . import multi

    if frame_format == "nv12":
        pool = frames[0].shape[0]
    else:
        pool = frames.shape[0]
    n_streams = active.shape[0]
    need = pool + n_streams          # slice start < pool, length n_streams
    tiles = -(-need // pool)

    def extend(x):
        return jnp.concatenate([x] * tiles, 0)[:need]

    if frame_format == "nv12":
        ext = (extend(frames[0]), extend(frames[1]))
    else:
        ext = extend(frames)

    def pick(i):
        # Streams s = 0..S-1 read pool frames (i + s) % P: one contiguous
        # block of the cyclically-extended pool.
        start = i % pool
        if frame_format == "nv12":
            fy = jax.lax.dynamic_slice_in_dim(ext[0], start, n_streams)
            fuv = jax.lax.dynamic_slice_in_dim(ext[1], start, n_streams)
            return (fy, fuv)
        return jax.lax.dynamic_slice_in_dim(ext, start, n_streams)

    def body(st, i):
        st, _bx, sc = multi.update_streams(params, st, pick(i), active, cfg,
                                           frame_format)
        return st, sc

    state, scores = jax.lax.scan(body, state, jnp.arange(reps))
    return state, scores


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format", "reps"),
                   donate_argnums=(1,))
def update_objects_scan_pool(params: Params, state: TrackState, frames,
                             active: jnp.ndarray, reps: int, cfg: ModelConfig,
                             frame_format: str = "nv12"
                             ) -> Tuple[TrackState, jnp.ndarray]:
    """``reps`` multi-object steps (N targets, one shared frame per step)
    as one scanned program, cycling the frame pool (BASELINE config 3).
    Returns (state, scores (reps, N))."""
    from . import multi

    if frame_format == "nv12":
        pool = frames[0].shape[0]

        def pick(i):
            return (frames[0][i % pool], frames[1][i % pool])
    else:
        pool = frames.shape[0]

        def pick(i):
            return frames[i % pool]

    def body(st, i):
        st, _bx, sc = multi.update_objects(params, st, pick(i), active, cfg,
                                           frame_format)
        return st, sc

    state, scores = jax.lax.scan(body, state, jnp.arange(reps))
    return state, scores


@functools.partial(jax.jit, static_argnames=("cfg", "reps"),
                   donate_argnums=(1,))
def update_scan_hud_pool(params: Params, state: TrackState, frames,
                         hud_text, reps: int, cfg: ModelConfig
                         ) -> Tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """Config-5 serving shape: EVERY tracked frame gets the full luma HUD
    composited on-device before reaching the display buffer.

    Mirrors the reference's per-frame draw pass (state text, FPS line,
    track-ms line, live score %, bbox rect + crosshair — pipeline.rs:
    125-174) inside the scanned hot loop: per frame the tracker step runs,
    the score percentage digits are rendered *on-device* from the live
    confidence, and the whole HUD is masked onto that frame's Y plane.
    The carry holds one composited display buffer that each frame
    overwrites — the TPU analog of the reference's leaky display queue
    (``max-size-buffers=3 leaky=downstream``, pipeline_ir.rs:75-78): a
    slow consumer sees only the newest frame, but every frame pays full
    composite cost.

    ``frames``: NV12 pool ((P, H, W), (P, H/2, W/2, 2)).  ``hud_text``:
    ((state_chars, state_n), (fps_chars, fps_n), (trk_chars, trk_n)) glyph
    index arrays from ops.font.encode_text.  Returns (state, display_luma
    (H, W) uint8, scores (reps,)).
    """
    from ..ops import font as font_mod
    from ..ops import overlay_nv12 as ol

    ys, uvs = frames
    pool = ys.shape[0]
    (state_chars, state_n), (fps_chars, fps_n), (trk_chars, trk_n) = hud_text
    # "score: XX.X%" — static prefix, live digits (glyph indices 0-9 ARE
    # the digit values), rendered on-device from the per-frame confidence.
    prefix, _ = font_mod.encode_text("score: ", 7)
    dot = jnp.asarray(font_mod.FONT_CHARS.index("."), jnp.int32)
    pct = jnp.asarray(font_mod.FONT_CHARS.index("%"), jnp.int32)
    prefix = jnp.asarray(prefix)

    def body(carry, i):
        st, disp = carry
        frame = (ys[i % pool], uvs[i % pool])
        st, bbox, conf = core.update(params, st, frame, cfg, "nv12")

        v = jnp.clip(jnp.round(conf * 1000.0), 0, 999).astype(jnp.int32)
        digits = jnp.stack([v // 100, (v // 10) % 10])
        score_chars = jnp.concatenate(
            [prefix, digits, dot[None], v[None] % 10, pct[None]])

        luma = ys[i % pool]
        luma = ol.draw_text_luma(luma, state_chars, state_n, 15, 15, 2, 255)
        luma = ol.draw_text_luma(luma, fps_chars, fps_n, 15, 40, 2, 255)
        luma = ol.draw_text_luma(luma, trk_chars, trk_n, 15, 65, 1, 200)
        luma = ol.draw_text_luma(luma, score_chars, score_chars.shape[0],
                                 200, 15, 2, 255, enable=conf > 0.25)
        bb = bbox.astype(jnp.int32)
        luma = ol.draw_rect_luma_strips(luma, bb[0], bb[1], bb[2], bb[3],
                                        3, 255)
        luma = ol.draw_crosshair_luma_strips(luma, bb[0] + bb[2] // 2,
                                             bb[1] + bb[3] // 2, 15, 255)
        # Overwrite the display buffer (leaky-sink semantics); XLA aliases
        # the carry slot so this is an in-place composite, not a growth.
        del disp
        return (st, luma), conf

    disp0 = jnp.zeros_like(ys[0])
    (state, disp), scores = jax.lax.scan(body, (state, disp0),
                                         jnp.arange(reps))
    return state, disp, scores
