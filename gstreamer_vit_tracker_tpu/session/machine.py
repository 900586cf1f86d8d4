"""Tracking-session state machine: Selecting -> Tracking -> Lost.

Faithful port of the reference's TrackerContext
(/root/reference/src/tracker_context.rs) over a pluggable tracker backend:

* two-phase corner confirm (latch start corner, then init on second
  confirm, tracker_context.rs:70-112);
* init is validated by an immediate ``update`` accepted only if
  ``success && score > 0.25`` (rs:90-98);
* per-frame tracking publishes bbox+score while ``score > 0.25`` (rs:122),
  else transitions to Lost;
* Lost counts frames and auto-resets to selection once the counter
  *exceeds* 60 — i.e. on its 62nd lost frame (rs:142-152);
* Cancel resets to selection at any time (rs:53-58); Quit is a no-op at
  this layer (rs:59).

The backend abstraction lets the machine run against the real JAX tracker
(single- or multi-object) or deterministic stubs in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Protocol, Tuple

from ..config import SessionConfig
from .commands import Kind, UserCommand
from .selection import SelectionPhase, SelectionState

BBox = Tuple[float, float, float, float]


class TrackerBackend(Protocol):
    def init(self, frame: Any, bbox: BBox) -> None: ...

    def update(self, frame: Any) -> Tuple[BBox, float, bool]:
        """Returns (bbox, score, success)."""


@dataclasses.dataclass
class Lost:
    frames: int = 0


class SessionState:
    SELECTING = "selecting"
    TRACKING = "tracking"
    LOST = "lost"


class TrackerSession:
    """Owns the tracker backend + UI state (TrackerContext analog)."""

    def __init__(self, tracker: TrackerBackend, width: int, height: int,
                 cfg: SessionConfig = SessionConfig(),
                 log: Callable[[str], None] = lambda s: print(s + "\r")):
        self.tracker = tracker
        self.cfg = cfg
        self.frame_width = width
        self.frame_height = height
        self.state: str = SessionState.SELECTING
        self.lost = Lost()
        self.selection = SelectionState.new(width, height, cfg)
        self.current_bbox: Optional[BBox] = None
        self.current_score: float = 0.0
        self.pending_confirm = False
        self.log = log

    # -- command plane (tracker_context.rs:36-61) --------------------------

    def handle_command(self, cmd: UserCommand) -> None:
        k = cmd.kind
        if k == Kind.MOVE_UP:
            self.selection.move_cursor(0, -1, cmd.fast, self.frame_width,
                                       self.frame_height)
        elif k == Kind.MOVE_DOWN:
            self.selection.move_cursor(0, 1, cmd.fast, self.frame_width,
                                       self.frame_height)
        elif k == Kind.MOVE_LEFT:
            self.selection.move_cursor(-1, 0, cmd.fast, self.frame_width,
                                       self.frame_height)
        elif k == Kind.MOVE_RIGHT:
            self.selection.move_cursor(1, 0, cmd.fast, self.frame_width,
                                       self.frame_height)
        elif k == Kind.CONFIRM:
            self.pending_confirm = True
        elif k == Kind.CANCEL:
            self.state = SessionState.SELECTING
            self.selection = SelectionState.new(self.frame_width,
                                                self.frame_height, self.cfg)
            self.current_bbox = None
            self.log("Reset to selection mode")
        elif k == Kind.QUIT:
            pass

    # -- frame plane (tracker_context.rs:64-155) ---------------------------

    def process_frame(self, frame: Any) -> Optional[BBox]:
        if self.state == SessionState.SELECTING:
            return self._process_selecting(frame)
        if self.state == SessionState.TRACKING:
            return self._process_tracking(frame)
        return self._process_lost(frame)

    def _process_selecting(self, frame: Any) -> Optional[BBox]:
        if not self.pending_confirm:
            return None
        self.pending_confirm = False

        if self.selection.phase == SelectionPhase.MOVING_TO_START:
            self.selection.start_x = self.selection.cursor_x
            self.selection.start_y = self.selection.cursor_y
            self.selection.phase = SelectionPhase.SELECTING_AREA
            self.log(f"*** Start point set at ({self.selection.start_x}, "
                     f"{self.selection.start_y}) ***")
            self.log("Now move to the SECOND corner and press Enter")
            return None

        bbox = self.selection.get_bbox(self.cfg.min_bbox)
        self.log(f"*** Initializing tracker with bbox: x={bbox[0]}, "
                 f"y={bbox[1]}, w={bbox[2]}, h={bbox[3]} ***")
        try:
            self.tracker.init(frame, bbox)
            result_bbox, score, success = self.tracker.update(frame)
        except Exception as e:  # tracker error path (rs:105-109)
            self.log(f"Tracker error: {e!r}")
            self._recover_backend()
            self.selection = SelectionState.new(self.frame_width,
                                                self.frame_height, self.cfg)
            return None

        self.log(f"Init result: score={score:.3f}")
        if success and score > self.cfg.score_threshold:
            self.current_bbox = result_bbox
            self.current_score = score
            self.state = SessionState.TRACKING
            self.log("*** TRACKING STARTED! ***")
            return self.current_bbox
        self.log("Low score - please try selecting a different area")
        self.selection = SelectionState.new(self.frame_width,
                                            self.frame_height, self.cfg)
        return None

    def _process_tracking(self, frame: Any) -> Optional[BBox]:
        self.pending_confirm = False
        try:
            bbox, score, success = self.tracker.update(frame)
        except Exception as e:
            self.log(f"Tracker error: {e!r}")
            self._recover_backend()
            if self.current_bbox is not None:
                # recover() drops TrackState (and with it the template);
                # re-seed from the last confirmed box on this frame so the
                # Lost ramp below can actually re-acquire.  Device faults
                # last a few frames, so the box is still live — without
                # this, every Lost-mode update raises 'tracker not
                # initialised' and the session limps to the auto-reset.
                try:
                    self.tracker.init(frame, self.current_bbox)
                except Exception as e2:
                    self.log(f"Re-init after recovery failed: {e2!r}")
            self.state = SessionState.LOST
            self.lost = Lost(0)
            return None
        if success and score > self.cfg.score_threshold:
            self.current_bbox = bbox
            self.current_score = score
            return bbox
        self.log(f"Track lost (score={score:.2f})")
        self.state = SessionState.LOST
        self.lost = Lost(0)
        self.current_score = 0.0
        return None

    def _recover_backend(self) -> None:
        """After a tracker exception, give the backend a chance to rebuild
        its device state (e.g. re-upload params after a device/relay
        reset).  Backends without a ``recover`` hook are left alone — the
        Lost/auto-reset path still re-arms the session."""
        recover = getattr(self.tracker, "recover", None)
        if recover is None:
            return
        try:
            recover()
        except Exception as e:
            self.log(f"Backend recovery failed: {e!r}")

    def force_lost(self) -> None:
        """Drop the session into Lost (fresh counter) after an external
        fault — e.g. the app loop recovering from a device/relay error.
        The normal Lost countdown then auto-resets to selection.  This
        exceeds the reference, which simply exits on pipeline errors
        (main.rs:56-65)."""
        self.state = SessionState.LOST
        self.lost = Lost(0)
        self.current_score = 0.0

    def _process_lost(self, frame: Any) -> Optional[BBox]:
        self.pending_confirm = False
        if self.lost.frames > self.cfg.lost_frames_max:
            self.log("Auto-reset to selection mode")
            self.state = SessionState.SELECTING
            self.selection = SelectionState.new(self.frame_width,
                                                self.frame_height, self.cfg)
            self.current_bbox = None
            return None
        # Keep updating while Lost: the core's frozen window + re-detection
        # ramp (tracker/core.py) only advance when the tracker sees frames,
        # so a target reappearing after occlusion is re-acquired here —
        # deliberately exceeding the reference, whose Lost state only
        # counts frames (tracker_context.rs:142-152).  The 60-frame
        # auto-reset above is preserved unchanged.
        try:
            bbox, score, success = self.tracker.update(frame)
        except Exception as e:
            self.log(f"Tracker error: {e!r}")
            self._recover_backend()
            self.lost = Lost(self.lost.frames + 1)
            return None
        if success and score > self.cfg.score_threshold:
            self.current_bbox = bbox
            self.current_score = score
            self.state = SessionState.TRACKING
            self.log(f"*** Target re-acquired (score={score:.2f}) ***")
            return bbox
        self.lost = Lost(self.lost.frames + 1)
        return None

    # -- status (tracker_context.rs:157-166) -------------------------------

    def state_name(self) -> str:
        if self.state == SessionState.SELECTING:
            if self.selection.phase == SelectionPhase.MOVING_TO_START:
                return "SELECT START"
            return "SELECT END"
        if self.state == SessionState.TRACKING:
            return "TRACKING"
        return "LOST"


class JaxTrackerBackend:
    """TrackerBackend over the functional JAX core (tracker/core.py).

    Keeps TrackState on device between calls; ships only the 4-float bbox
    and the score back to the host per update.

    ``pipelined=True`` trades one frame of latency for throughput: each
    ``update`` dispatches the current frame asynchronously and returns the
    *previous* frame's result, so the host never blocks on in-flight
    device work (the TPU analog of the reference's decoupled streaming
    threads + leaky display queue, pipeline_ir.rs:75-84 — the display
    there also shows slightly stale overlays when processing lags).
    """

    def __init__(self, params: Dict[str, Any], cfg, frame_format: str = "rgb",
                 pipelined: bool = False):
        import jax
        import jax.numpy as jnp

        from ..tracker import core

        from ..models import vittrack

        self._jax = jax
        self._jnp = jnp
        self._core = core
        self.params = vittrack.with_grouped_head(params)
        self.cfg = cfg
        self.frame_format = frame_format
        self.pipelined = pipelined
        self._pending = None
        self.state = None
        # Host-side copy for device-loss recovery (a dead device leaves
        # self.params pointing at unreachable buffers).
        self._host_params = jax.device_get(self.params)

    def recover(self) -> None:
        """Rebuild device state after a device/relay fault: re-upload
        params from the host copy and drop the (possibly dead) TrackState
        and in-flight work.  The session re-inits on the next confirm."""
        self.params = self._jax.tree.map(self._jnp.asarray,
                                         self._host_params)
        self.state = None
        self._pending = None

    def _to_device(self, frame):
        jnp = self._jnp
        if self.frame_format in ("rgb", "yuy2"):
            return jnp.asarray(frame)
        y, uv = frame
        return (jnp.asarray(y), jnp.asarray(uv))

    def init(self, frame, bbox) -> None:
        jnp = self._jnp
        self.state = self._core.init_jit(
            self.params, self._to_device(frame),
            jnp.asarray(bbox, jnp.float32), self.cfg, self.frame_format)
        self._pending = None

    def update(self, frame):
        if self.state is None:
            raise RuntimeError("tracker not initialised")
        import numpy as np

        self.state, packed = self._core.update_packed_jit(
            self.params, self.state, self._to_device(frame), self.cfg,
            self.frame_format)
        if self.pipelined:
            prev, self._pending = self._pending, packed
            if prev is None:          # first frame: no previous result yet
                prev = packed
            vals = np.asarray(prev)
        else:
            vals = np.asarray(packed)   # ONE device->host fetch per frame
        return tuple(float(v) for v in vals[:4]), float(vals[4]), True
