"""TrackState — the HBM-resident per-target tracking state.

In the reference, the only cross-frame state is the template feature cached
*inside* the opaque NPU tracker between ``init`` and ``update`` calls plus
the last bbox held by TrackerContext (SURVEY.md §5 "checkpoint/resume:
ABSENT ... In the TPU build this becomes explicit").  Here it is a
first-class pytree that

* lives in device HBM across frames (the jitted update step donates and
  returns it, so XLA reuses the buffers in place);
* is trivially batchable (vmap over objects/streams adds leading axes);
* is checkpointable with models.weights.save_orbax / save_npz.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig


class TrackState(NamedTuple):
    """State carried between frames for one tracked target."""

    z_tok: jnp.ndarray       # (Nz, D) cached template tokens (current)
    z_tok_init: jnp.ndarray  # (Nz, D) template tokens captured at init
    bbox: jnp.ndarray        # (4,) float32 (x, y, w, h) in frame pixels
    score: jnp.ndarray       # () float32 last confidence
    frame_idx: jnp.ndarray   # () int32 frames since init
    # () int32 consecutive low-confidence frames; drives the re-detection
    # search-window expansion (config.py::lost_window_growth) and resets
    # to 0 on any confident frame.
    lost_frames: jnp.ndarray


def zeros_state(cfg: ModelConfig, dtype=jnp.float32) -> TrackState:
    """An inert state (useful as vmap fill for inactive slots)."""
    nz = cfg.num_template_tokens
    d = cfg.embed_dim
    tok_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else dtype
    return TrackState(
        z_tok=jnp.zeros((nz, d), tok_dtype),
        z_tok_init=jnp.zeros((nz, d), tok_dtype),
        bbox=jnp.zeros((4,), jnp.float32),
        score=jnp.zeros((), jnp.float32),
        frame_idx=jnp.zeros((), jnp.int32),
        lost_frames=jnp.zeros((), jnp.int32),
    )


def stack_states(states) -> TrackState:
    """Stack per-target states into a batched TrackState (leading axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)
