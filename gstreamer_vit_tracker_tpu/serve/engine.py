"""Slot engine: a fixed pool of tracking slots over ONE compiled TPU step.

The serving tick is the repo's batched multi-stream update
(tracker/multi.py::update_streams — BASELINE.json config 4) with a static
slot count S, so XLA compiles exactly one program regardless of how many
clients are connected: dynamic arrival/departure is data (the per-tick
``active`` mask and a ``dynamic_update_slice`` slot write), never a new
shape.  That is the TPU-native answer to "dynamic batching" — the MXU
wants one big static-shape GEMM, and an idle slot costs a masked lane,
not a recompile.

Contrast with the reference, whose tracker engine is strictly
single-stream and in-process (/root/reference/src/tracker_context.rs:88-94;
SURVEY.md §2.9): the serving tier is a deliberate framework extension.

Fault story (matches ShardedStreamTracker / JaxTrackerBackend.recover):
params keep a host-side master copy, live slot state snapshots to host
every ``snapshot_every`` ticks, and :meth:`recover` rebuilds device state
after a device/relay fault.  Slots initialised after the last snapshot
come back dead — their clients must re-init (the server reports this).
"""

from __future__ import annotations

import functools
import threading
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..tracker import core, multi
from ..tracker.multi import _batched_cfg
from ..tracker.state import TrackState, zeros_state

Params = Dict[str, Any]


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format"),
                   donate_argnums=(1,))
def _step_packed(params, state, frames, active, cfg: ModelConfig,
                 frame_format: str):
    """One serving tick: S streams -> (new_state, packed (S, 5)).

    Packing [x, y, w, h, score] into ONE array keeps the per-tick host
    fetch to a single round trip (same rationale as core.update_packed_jit
    — on a relay-attached TPU every sync read is ~30 ms)."""
    state, bboxes, scores = multi.update_streams(params, state, frames,
                                                 active, cfg, frame_format)
    return state, jnp.concatenate([bboxes[:, 0, :], scores], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "frame_format"),
                   donate_argnums=(0,))
def _write_slot(state, params, frame, bbox, slot, cfg: ModelConfig,
                frame_format: str):
    """core.init one target, then dynamic_update_slice it into slot
    ``slot`` of the batched (S, 1, ...) state.  ``slot`` is a traced i32
    scalar, so slot allocation never recompiles."""
    new = core.init(params, frame, bbox, _batched_cfg(cfg), frame_format)

    def wr(batched, leaf):
        upd = leaf[None, None].astype(batched.dtype)
        starts = (slot,) + (0,) * (batched.ndim - 1)
        return jax.lax.dynamic_update_slice(batched, upd, starts)

    return jax.tree.map(wr, state, new)


class SlotEngine:
    """S tracking slots, one jitted batched step, host-snapshot recovery.

    Not thread-safe by itself: the server serialises all calls (the tick
    step donates ``self.state``, so concurrent mutation would reuse a
    donated buffer — the classic axon "TPU backend error")."""

    def __init__(self, params: Params, cfg: ModelConfig, slots: int,
                 frame_format: str = "nv12", snapshot_every: int = 60,
                 mesh=None):
        if frame_format not in ("nv12", "yuy2", "rgb"):
            raise ValueError(f"unknown frame format {frame_format!r}")
        self.cfg = cfg
        self.slots = slots
        self.frame_format = frame_format
        self.snapshot_every = snapshot_every
        self.mesh = mesh
        if mesh is not None:
            # Multi-chip serving: the slot axis shards over the mesh 'data'
            # axis (same layout as parallel/serving.py::ShardedStreamTracker).
            # On a pure-data mesh params replicate (embarrassingly parallel,
            # no steady-state collectives); on a dp x tp mesh params take
            # the Megatron tensor-parallel layout (parallel/sharding.py) and
            # XLA inserts the all-reduces inside the serving forward — the
            # layout for models too large to replicate per chip.  Slot count
            # must tile the DATA axis (the model axis does not split slots).
            from ..parallel.mesh import DATA_AXIS as _DA

            dp = mesh.shape[_DA]
            if slots % dp != 0:
                raise ValueError(f"slots={slots} must be a multiple of the "
                                 f"mesh data-axis size {dp}")
        self._host_params = jax.device_get(params)
        self.params = self._place_params(params)
        z = zeros_state(cfg)
        self.state: TrackState = self._place_state(jax.tree.map(
            lambda x: np.zeros((slots, 1) + x.shape, x.dtype), z))
        # Host-side occupancy: which slots hold a live track.  Device-side
        # liveness is the per-tick active mask built from this.
        self.occupied = np.zeros(slots, bool)
        self._ticks = 0
        self._snapshot = None    # (host TrackState, occupancy at snapshot)
        self.lock = threading.Lock()

    # -- placement (single device, or slot axis over the mesh 'data' axis) --

    def _place_params(self, params):
        if self.mesh is None:
            return jax.tree.map(jnp.asarray, params)
        from ..parallel.mesh import MODEL_AXIS
        from ..parallel.sharding import replicate, shard_params

        if self.mesh.shape.get(MODEL_AXIS, 1) > 1:
            return shard_params(jax.tree.map(jnp.asarray, params), self.mesh)
        return replicate(jax.tree.map(jnp.asarray, params), self.mesh)

    def _place_state(self, state):
        if self.mesh is None:
            return jax.tree.map(jnp.asarray, state)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        return jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), NamedSharding(
                self.mesh, P(DATA_AXIS, *([None] * (np.ndim(x) - 1))))),
            state)

    def _place_leading(self, x):
        """Shard a (S, ...) array's leading axis over the mesh (identity on
        a single device)."""
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        return jax.device_put(jnp.asarray(x), NamedSharding(
            self.mesh, P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))))

    # -- slot lifecycle ----------------------------------------------------

    def alloc(self) -> int:
        """Reserve a free slot index; raises RuntimeError when full."""
        free = np.flatnonzero(~self.occupied)
        if free.size == 0:
            raise RuntimeError(f"all {self.slots} slots busy")
        self.occupied[free[0]] = True
        return int(free[0])

    def init_slot(self, slot: int, frame, bbox) -> None:
        """Start a track in ``slot`` (template capture + state write)."""
        self.state = _write_slot(
            self.state, self.params, _as_device(frame, self.frame_format),
            jnp.asarray(bbox, jnp.float32), jnp.int32(slot), self.cfg,
            self.frame_format)
        self.occupied[slot] = True
        if self._snapshot is None:
            self.snapshot()

    def release(self, slot: int) -> None:
        self.occupied[slot] = False

    # -- the tick ------------------------------------------------------------

    def step_async(self, frames, tick_active: np.ndarray):
        """Dispatch one batched tick WITHOUT fetching the result: returns
        the packed (S, 5) [x, y, w, h, score] result as a DEVICE array the
        caller materialises later (``np.asarray``).

        JAX async dispatch makes the next tick legal immediately — the
        donated state chain threads through dispatches in call order — so
        a server can overlap tick N's host fetch (one full relay RTT on
        the dev box) with tick N+1's device step instead of paying
        step+RTT serially per tick (VERDICT r4 item 1; the reference's
        own display path is decoupled from processing the same way,
        /root/reference/src/pipeline_ir.rs:75-84)."""
        self._ticks += 1
        if self.snapshot_every and self._ticks % self.snapshot_every == 0:
            self.snapshot()
        active = self._place_leading((tick_active & self.occupied)[:, None])
        self.state, packed = _step_packed(
            self.params, self.state, self._place_frames(frames),
            active, self.cfg, self.frame_format)
        return packed

    def step(self, frames, tick_active: np.ndarray) -> np.ndarray:
        """One SYNCHRONOUS batched tick.  ``frames`` are full (S, ...) host
        buffers; ``tick_active`` (S,) bool marks slots with a FRESH frame
        this tick (stale slots' state is held bit-for-bit by the masked
        update).  Returns packed (S, 5) [x, y, w, h, score] float32."""
        return np.asarray(self.step_async(frames, tick_active))

    def _place_frames(self, frames):
        if self.frame_format == "nv12":
            y, uv = frames
            return self._place_leading(y), self._place_leading(uv)
        return self._place_leading(frames)

    # -- fault recovery ------------------------------------------------------

    def snapshot(self) -> None:
        self._snapshot = (jax.device_get(self.state), self.occupied.copy())

    def recover(self) -> list:
        """Rebuild device state after a device/relay fault.  Returns the
        slot indices that could NOT be restored (initialised after the
        last snapshot, or never snapshotted) — the server reports these
        to their clients as re-init-required."""
        self.params = self._place_params(self._host_params)
        if self._snapshot is None:
            lost = np.flatnonzero(self.occupied)
            z = zeros_state(self.cfg)
            self.state = self._place_state(jax.tree.map(
                lambda x: np.zeros((self.slots, 1) + x.shape, x.dtype), z))
            self.occupied[:] = False
            return [int(i) for i in lost]
        state, occ = self._snapshot
        self.state = self._place_state(state)
        lost = np.flatnonzero(self.occupied & ~occ)
        self.occupied = occ.copy()
        return [int(i) for i in lost]


def _as_device(frames, fmt: str):
    if fmt == "nv12":
        y, uv = frames
        return jnp.asarray(y), jnp.asarray(uv)
    return jnp.asarray(frames)
