"""Session state-machine tests: thresholds 0.25 / 60-frame lost timeout /
20px min bbox / cursor step+clamp / two-phase confirm — the constants the
reference hard-codes (SURVEY.md §4 "state-machine unit tests")."""

from gstreamer_vit_tracker_tpu.config import SessionConfig
from gstreamer_vit_tracker_tpu.session import (Kind, SelectionState,
                                               TrackerSession, UserCommand,
                                               decode_key)


class StubTracker:
    """Scripted backend: returns queued (bbox, score, success) results."""

    def __init__(self, results):
        self.results = list(results)
        self.init_calls = []

    def init(self, frame, bbox):
        self.init_calls.append(bbox)

    def update(self, frame):
        if not self.results:
            return (0.0, 0.0, 10.0, 10.0), 0.9, True
        r = self.results.pop(0)
        if isinstance(r, Exception):
            raise r
        return r


def make_session(results, **cfg_kw):
    cfg = SessionConfig(**cfg_kw)
    tr = StubTracker(results)
    s = TrackerSession(tr, 640, 512, cfg, log=lambda m: None)
    return s, tr


GOOD = ((100.0, 100.0, 50.0, 50.0), 0.9, True)


def confirm_twice(s):
    s.handle_command(UserCommand(Kind.CONFIRM))
    s.process_frame(None)
    s.handle_command(UserCommand(Kind.CONFIRM))
    return s.process_frame(None)


def test_two_phase_confirm_starts_tracking():
    s, tr = make_session([GOOD])
    assert s.state_name() == "SELECT START"
    s.handle_command(UserCommand(Kind.CONFIRM))
    s.process_frame(None)
    assert s.state_name() == "SELECT END"
    s.handle_command(UserCommand(Kind.CONFIRM))
    bbox = s.process_frame(None)
    assert s.state_name() == "TRACKING"
    assert bbox == GOOD[0]
    assert len(tr.init_calls) == 1


def test_init_score_at_threshold_rejected():
    # tracker_context.rs:93 — strict '> 0.25'.
    s, _ = make_session([((0, 0, 10, 10), 0.25, True)])
    confirm_twice(s)
    assert s.state_name() == "SELECT START"   # selection re-armed


def test_init_just_above_threshold_accepted():
    s, _ = make_session([((0, 0, 10, 10), 0.2500001, True)])
    confirm_twice(s)
    assert s.state_name() == "TRACKING"


def test_tracking_loss_and_auto_reset_after_62_lost_frames():
    # Enter Lost on a low score, then the reference resets when the counter
    # EXCEEDS 60 — the 62nd lost-state frame (tracker_context.rs:142-151).
    # Lost frames keep updating the tracker (re-detection); every update
    # here stays below threshold so the counter runs to the reset.
    low = ((0, 0, 1, 1), 0.1, True)
    s, _ = make_session([GOOD] + [low] * 80)
    confirm_twice(s)
    s.process_frame(None)                   # low score -> Lost(0)
    assert s.state_name() == "LOST"
    for i in range(61):                     # counter climbs to 61
        s.process_frame(None)
        assert s.state_name() == "LOST", f"reset too early at {i}"
    s.process_frame(None)                   # frames(61) > 60 -> reset
    assert s.state_name() == "SELECT START"


def test_lost_reacquires_on_confident_update():
    """While Lost the session keeps feeding the tracker (frozen window +
    re-detection ramp live in tracker/core.py); a confident update flips
    straight back to TRACKING without a re-selection."""
    low = ((0, 0, 1, 1), 0.1, True)
    back = ((200.0, 150.0, 50.0, 50.0), 0.8, True)
    s, _ = make_session([GOOD, low, low, low, back])
    confirm_twice(s)
    s.process_frame(None)                   # -> Lost(0)
    s.process_frame(None)                   # low
    s.process_frame(None)                   # low
    assert s.state_name() == "LOST"
    bbox = s.process_frame(None)            # confident -> re-acquired
    assert s.state_name() == "TRACKING"
    assert bbox == back[0]
    assert s.current_score == 0.8
    # A later loss starts a FRESH 60-frame countdown.
    s.process_frame(None)                   # stub queue empty -> 0.9 GOOD-ish
    assert s.state_name() == "TRACKING"


def test_lost_update_error_counts_and_recovers_backend():
    """A tracker exception while Lost must not crash the session: it
    counts as a lost frame and triggers backend recovery."""
    low = ((0, 0, 1, 1), 0.1, True)
    s, tr = make_session([GOOD, low, RuntimeError("boom"), low])
    tr.recovered = 0
    tr.recover = lambda: setattr(tr, "recovered", tr.recovered + 1)
    confirm_twice(s)
    s.process_frame(None)                   # -> Lost(0)
    s.process_frame(None)                   # raises -> counted, recovered
    assert s.state_name() == "LOST"
    assert tr.recovered == 1
    s.process_frame(None)                   # low, still LOST
    assert s.state_name() == "LOST"


def test_tracker_error_during_tracking_goes_lost():
    s, _ = make_session([GOOD, RuntimeError("boom")])
    confirm_twice(s)
    s.process_frame(None)
    assert s.state_name() == "LOST"


def test_tracker_error_during_init_rearms_selection():
    s, _ = make_session([RuntimeError("boom")])
    confirm_twice(s)
    assert s.state_name() == "SELECT START"


def test_cancel_resets_from_tracking():
    s, _ = make_session([GOOD])
    confirm_twice(s)
    assert s.state_name() == "TRACKING"
    s.handle_command(UserCommand(Kind.CANCEL))
    assert s.state_name() == "SELECT START"
    assert s.current_bbox is None


def test_min_bbox_20px():
    # selection_state.rs:39-45.
    sel = SelectionState.new(640, 512)
    sel.start_x, sel.start_y = 100, 100
    sel.cursor_x, sel.cursor_y = 105, 330
    assert sel.get_bbox() == (100, 100, 20, 230)


def test_cursor_step_and_clamp():
    sel = SelectionState.new(640, 512)
    assert (sel.cursor_x, sel.cursor_y) == (320, 256)
    sel.move_cursor(1, 0, False, 640, 512)
    assert sel.cursor_x == 330                       # step 10
    sel.move_cursor(1, 0, True, 640, 512)
    assert sel.cursor_x == 380                       # fast step 50
    for _ in range(20):
        sel.move_cursor(1, 0, True, 640, 512)
    assert sel.cursor_x == 639                       # clamped to width-1
    for _ in range(30):
        sel.move_cursor(0, -1, True, 640, 512)
    assert sel.cursor_y == 0                         # clamped to 0


def test_state_names():
    s, _ = make_session([GOOD])
    assert s.state_name() == "SELECT START"
    s.handle_command(UserCommand(Kind.CONFIRM))
    s.process_frame(None)
    assert s.state_name() == "SELECT END"
    s.handle_command(UserCommand(Kind.CONFIRM))
    s.process_frame(None)
    assert s.state_name() == "TRACKING"


def test_keymap():
    # raw_mode_guard.rs:65-101.
    assert decode_key(10).kind == Kind.CONFIRM
    assert decode_key(13).kind == Kind.CONFIRM
    assert decode_key(32).kind == Kind.CONFIRM
    assert decode_key(ord("w")).kind == Kind.MOVE_UP
    assert decode_key(ord("I")).kind == Kind.MOVE_UP
    assert decode_key(ord("t")) == UserCommand(Kind.MOVE_UP, fast=True)
    assert decode_key(ord("h")) == UserCommand(Kind.MOVE_RIGHT, fast=True)
    assert decode_key(27).kind == Kind.CANCEL
    assert decode_key(ord("q")).kind == Kind.QUIT
    assert decode_key(91) is None                    # '[' filler
    assert decode_key(ord("z")) is None


def test_confirm_flag_cleared_in_tracking():
    s, _ = make_session([GOOD, GOOD, GOOD])
    confirm_twice(s)
    s.handle_command(UserCommand(Kind.CONFIRM))      # stray confirm
    s.process_frame(None)
    assert not s.pending_confirm
