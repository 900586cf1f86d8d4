"""Fault injection: the session machine must ride out corrupt/stalled
input via its Lost/auto-reset path (SURVEY.md §5 — the reference has no
injection hooks; we add them)."""

import jax
import numpy as np

from gstreamer_vit_tracker_tpu.config import ModelConfig, SessionConfig
from gstreamer_vit_tracker_tpu.media.source import FlakySource, SyntheticSource
from gstreamer_vit_tracker_tpu.models import vittrack
from gstreamer_vit_tracker_tpu.session import JaxTrackerBackend, TrackerSession

CORR = ModelConfig(template_size=64, search_size=128, patch_size=8,
                   embed_dim=64, depth=0, num_heads=2, head_mode="corr",
                   dtype="float32")


def test_flaky_source_repeats_and_corrupts():
    src = FlakySource(SyntheticSource(128, 96, obj_size=32, seed=1),
                      drop_every=3, corrupt_every=5)
    f1 = src.frame(1)
    f2 = src.frame(2)
    f3 = src.frame(3)           # dropped -> repeat of f2
    np.testing.assert_array_equal(f3, f2)
    f5 = src.frame(5)           # corrupted -> noise, differs from clean
    assert not np.array_equal(f5, src.inner.frame(5))
    assert f1.shape == f5.shape


def test_session_survives_corrupt_frames():
    """Feed fully-corrupted frames mid-track: the session must degrade to
    LOST (score below 0.25) and keep running, never crash."""
    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    clean = SyntheticSource(320, 256, obj_size=48, seed=3)
    backend = JaxTrackerBackend(params, CORR)
    sess = TrackerSession(backend, 320, 256, SessionConfig(),
                          log=lambda m: None)

    bbox0 = tuple(int(v) for v in clean.bbox_at(0))
    backend.init(clean.frame_rgb(0), bbox0)
    b, score, ok = backend.update(clean.frame_rgb(0))
    sess.current_bbox = b
    sess.current_score = score
    sess.state = "tracking"

    rng = np.random.default_rng(0)
    states = []
    for i in range(1, 12):
        if i <= 3:
            frame = clean.frame_rgb(i)
        else:
            frame = rng.integers(0, 256, (256, 320, 3), dtype=np.uint8)
        sess.process_frame(frame)
        states.append(sess.state_name())
    assert states[0] == "TRACKING"
    assert "LOST" in states, states
    # Machine still alive and in a valid state.
    assert sess.state_name() in ("LOST", "SELECT START", "TRACKING")


def test_concurrent_commands_during_tracking():
    """Race-analog stress (SURVEY.md §5: the reference leans on Rust's
    type system; we pin thread safety with a stress test): a keyboard
    thread hammers commands while the frame loop processes — no crashes,
    no lost-state corruption."""
    import queue as pyqueue
    import threading

    from gstreamer_vit_tracker_tpu.session.commands import Kind, UserCommand

    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    clean = SyntheticSource(320, 256, obj_size=48, seed=3)
    backend = JaxTrackerBackend(params, CORR)
    sess = TrackerSession(backend, 320, 256, SessionConfig(),
                          log=lambda m: None)
    cmd_q: pyqueue.Queue = pyqueue.Queue()
    stop = threading.Event()

    def hammer():
        kinds = [Kind.MOVE_UP, Kind.MOVE_DOWN, Kind.MOVE_LEFT,
                 Kind.MOVE_RIGHT, Kind.CONFIRM, Kind.CANCEL]
        i = 0
        while not stop.is_set():
            cmd_q.put(UserCommand(kinds[i % len(kinds)], fast=bool(i % 2)))
            i += 1

    t = threading.Thread(target=hammer, daemon=True)
    t.start()
    try:
        for i in range(30):
            drained = 0
            while drained < 200:
                try:
                    sess.handle_command(cmd_q.get_nowait())
                    drained += 1
                except pyqueue.Empty:
                    break
            sess.process_frame(clean.frame_rgb(i))
            assert 0 <= sess.selection.cursor_x < 320
            assert 0 <= sess.selection.cursor_y < 256
            assert sess.state_name() in ("SELECT START", "SELECT END",
                                         "TRACKING", "LOST")
    finally:
        stop.set()
        t.join(timeout=2)
