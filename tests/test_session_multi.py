"""MultiObjectSession unit tests with a stub batched backend.

Per-slot semantics mirror the reference's single-object machine
(/root/reference/src/tracker_context.rs:93,122,142-152) applied slot by
slot: 0.25 acceptance, Lost countdown, auto-reset of ONLY the lost slot.
"""

import numpy as np

from gstreamer_vit_tracker_tpu.config import SessionConfig
from gstreamer_vit_tracker_tpu.session.commands import Kind, UserCommand
from gstreamer_vit_tracker_tpu.session.multi import (MultiObjectSession,
                                                     Slot)


class StubMultiBackend:
    """Scores come from a per-slot schedule; boxes echo the init bbox."""

    def __init__(self, n):
        self.n = n
        self.state = None
        self.active = np.zeros(n, bool)
        self.boxes = np.zeros((n, 4), np.float32)
        self.score_fn = lambda k, tick: 0.9
        self.tick = 0

    def init_slot(self, frame, k, bbox):
        self.state = "live"
        self.active[k] = True
        self.boxes[k] = bbox

    def deactivate(self, k):
        self.active[k] = False

    def update(self, frame):
        self.tick += 1
        scores = np.asarray([self.score_fn(k, self.tick) if self.active[k]
                             else 0.0 for k in range(self.n)], np.float32)
        return self.boxes.copy(), scores

    def update_slot(self, frame, k):
        # One-hot validation update: other slots must NOT advance (no tick).
        scores = np.zeros(self.n, np.float32)
        scores[k] = self.score_fn(k, self.tick)
        return self.boxes.copy(), scores


def confirm(sess):
    sess.handle_command(UserCommand(Kind.CONFIRM))


def select_box(sess, x0, y0, x1, y1):
    sess.selection.cursor_x, sess.selection.cursor_y = x0, y0
    confirm(sess)
    sess.process_frame("f")
    sess.selection.cursor_x, sess.selection.cursor_y = x1, y1
    confirm(sess)
    sess.process_frame("f")


def make():
    be = StubMultiBackend(2)
    logs = []
    sess = MultiObjectSession(be, 320, 256, SessionConfig(),
                              log=logs.append)
    return be, sess, logs


def test_sequential_selection_arms_slots_in_order():
    be, sess, logs = make()
    assert sess.state_name() == "SELECT START 1 OF 2"
    select_box(sess, 100, 100, 160, 160)
    assert sess.slots[0] == Slot.TRACKING
    assert sess.state_name() == "SELECT START 2 OF 2"
    select_box(sess, 30, 30, 80, 80)
    assert sess.slots == [Slot.TRACKING, Slot.TRACKING]
    assert sess.state_name() == "TRACKING 2 OF 2"
    assert [tuple(map(int, b))
            for _, b, _ in sess.tracked_boxes()] == [(100, 100, 60, 60),
                                                     (30, 30, 50, 50)]


def test_low_score_init_rejected_and_rearmed():
    be, sess, logs = make()
    be.score_fn = lambda k, t: 0.1
    select_box(sess, 100, 100, 160, 160)
    assert sess.slots[0] == Slot.SELECTING
    assert not be.active[0]
    assert any("Low score" in m for m in logs)


def test_per_slot_lost_and_auto_reset():
    be, sess, logs = make()
    select_box(sess, 100, 100, 160, 160)
    select_box(sess, 30, 30, 80, 80)
    # Slot 1 collapses; slot 0 stays confident.
    be.score_fn = lambda k, t: 0.9 if k == 0 else 0.0
    sess.process_frame("f")
    assert sess.slots == [Slot.TRACKING, Slot.LOST]
    assert sess.state_name() == "TRACKING 1 OF 2"
    # Reference bound: the counter increments to 61 over the next 61
    # frames (still Lost), and the reset fires on the frame after it
    # exceeds 60 — the same arithmetic test_session pins for the
    # single-object machine (tracker_context.rs:142-152).
    cfg = SessionConfig()
    for _ in range(cfg.lost_frames_max + 1):
        sess.process_frame("f")
    assert sess.slots[1] == Slot.LOST          # still counting
    sess.process_frame("f")
    assert sess.slots[1] == Slot.SELECTING     # auto-reset, slot 0 intact
    assert sess.slots[0] == Slot.TRACKING
    assert not be.active[1] and be.active[0]


def test_cancel_rearms_current_selection_then_cycles():
    be, sess, logs = make()
    sess.selection.cursor_x = 11
    confirm(sess)
    sess.process_frame("f")
    assert sess.selection.phase.value == "selecting_area"
    sess.handle_command(UserCommand(Kind.CANCEL))
    assert sess.selection.phase.value == "moving_to_start"
    # Fully armed: Cancel drops slot 0 back to selection.
    select_box(sess, 100, 100, 160, 160)
    select_box(sess, 30, 30, 80, 80)
    sess.handle_command(UserCommand(Kind.CANCEL))
    assert sess.slots[0] == Slot.SELECTING
    assert sess.slots[1] == Slot.TRACKING


def test_stateless_backend_rearms_all_slots():
    be, sess, logs = make()
    select_box(sess, 100, 100, 160, 160)
    be.state = None                       # device fault wiped the backend
    sess.process_frame("f")
    assert sess.slots == [Slot.SELECTING, Slot.SELECTING]
