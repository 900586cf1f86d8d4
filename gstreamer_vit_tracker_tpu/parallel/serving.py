"""Multi-chip serving: N video streams sharded across the data axis.

BASELINE.json config 4 (16 concurrent 1080p streams in one batched step),
scaled past one chip: frames and per-stream TrackState shard their leading
axis over the mesh 'data' axis, params replicate, and the whole batched
update (fused NV12 preprocess -> ViT -> decode) runs as one pjit program
per frame tick with NO cross-stream communication — stream parallelism is
embarrassingly parallel, so the only collectives XLA inserts are for the
(replicated) param broadcast at placement time.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..tracker import multi
from ..tracker.state import TrackState
from .mesh import DATA_AXIS
from .sharding import replicate, shard_batch

Params = Dict[str, Any]


class ShardedStreamTracker:
    """Device-mesh-wide multi-stream tracker.

    Usage:
        t = ShardedStreamTracker(mesh, params, cfg, frame_format="nv12")
        t.init(frames, bboxes)                  # (S, ...) , (S, M, 4)
        bboxes, scores = t.update(frames)       # one pjit step per tick
    """

    def __init__(self, mesh: Mesh, params: Params, cfg: ModelConfig,
                 frame_format: str = "rgb", snapshot_every: int = 60):
        self.mesh = mesh
        self.cfg = cfg
        self.frame_format = frame_format
        # Host-side copies for device-loss recovery: a dead device (or a
        # relay reset) leaves every jax.Array here pointing at unreachable
        # buffers; params re-upload from this copy, live TrackState from
        # the periodic snapshot (same contract as the single-stream
        # JaxTrackerBackend.recover, session/machine.py).
        self._host_params = jax.device_get(params)
        self.params = replicate(params, mesh)
        self.state: TrackState | None = None
        self.snapshot_every = snapshot_every
        self._snapshot = None          # (host TrackState, host active)
        self._ticks = 0

        @functools.partial(jax.jit, static_argnames=("cfg", "frame_format"),
                           donate_argnums=(1,))
        def _step(params, state, frames, active, cfg, frame_format):
            return multi.update_streams(params, state, frames, active, cfg,
                                        frame_format)

        self._step = _step

    def _shard_frames(self, frames):
        if self.frame_format == "rgb":
            return shard_batch(jnp.asarray(frames), self.mesh)
        y, uv = frames
        return (shard_batch(jnp.asarray(y), self.mesh),
                shard_batch(jnp.asarray(uv), self.mesh))

    def init(self, frames, bboxes) -> None:
        frames = self._shard_frames(frames)
        bboxes = shard_batch(jnp.asarray(bboxes, jnp.float32), self.mesh)
        state = multi.init_streams_jit(self.params, frames, bboxes, self.cfg,
                                   self.frame_format)
        # Keep state sharded over streams.
        self.state = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(
                self.mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))), state)
        self.active = shard_batch(
            jnp.ones(bboxes.shape[:2], bool), self.mesh)
        self._ticks = 0
        # Immediate first snapshot: recovery works from tick one.
        if self.snapshot_every:
            self._snapshot = (jax.device_get(self.state),
                              jax.device_get(self.active))

    def _reshard_state(self, state: TrackState) -> TrackState:
        return jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), NamedSharding(
                self.mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))), state)

    def update(self, frames) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.state is None:
            raise RuntimeError("call init first")
        self._ticks += 1
        if self.snapshot_every and self._ticks % self.snapshot_every == 0:
            # ~1 MB host copy per 16 bf16-template streams — negligible
            # next to the frame feed, and it bounds recovery staleness.
            self._snapshot = (jax.device_get(self.state),
                              jax.device_get(self.active))
        frames = self._shard_frames(frames)
        self.state, bboxes, scores = self._step(
            self.params, self.state, frames, self.active, self.cfg,
            self.frame_format)
        return bboxes, scores

    def recover(self) -> None:
        """Rebuild device state after a device/relay fault: params
        re-replicate from the host copy; live per-stream state restores
        from the latest snapshot (or drops to None, requiring re-init,
        when none was taken yet).  One call, then the next ``update`` tick
        proceeds normally."""
        self.params = replicate(jax.tree.map(jnp.asarray,
                                             self._host_params), self.mesh)
        if self._snapshot is not None:
            state, active = self._snapshot
            self.state = self._reshard_state(state)
            self.active = shard_batch(jnp.asarray(active), self.mesh)
        else:
            self.state = None
