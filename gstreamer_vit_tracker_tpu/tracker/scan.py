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

    if frame_format == "nv12":
        xs = frames            # tuple of stacked planes scans elementwise
    else:
        xs = frames
    state, (bboxes, scores) = jax.lax.scan(body, state, xs)
    return state, bboxes, scores


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format", "reps"),
                   donate_argnums=(1,))
def update_scan_pool(params: Params, state: TrackState, frames, reps: int,
                     cfg: ModelConfig, frame_format: str = "nv12"
                     ) -> Tuple[TrackState, jnp.ndarray]:
    """Benchmark variant: ``reps`` tracked frames cycling through a small
    HBM-resident frame pool by index (no per-frame host involvement at
    all).  Returns (state, scores (reps,))."""
    if frame_format == "nv12":
        pool = frames[0].shape[0]

        def pick(i):
            return (frames[0][i % pool], frames[1][i % pool])
    else:
        pool = frames.shape[0]

        def pick(i):
            return frames[i % pool]

    def body(st, i):
        st, _bbox, conf = core.update(params, st, pick(i), cfg, frame_format)
        return st, conf

    state, scores = jax.lax.scan(body, state, jnp.arange(reps))
    return state, scores
