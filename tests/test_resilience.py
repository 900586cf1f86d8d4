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


def test_session_reacquires_after_device_fault(monkeypatch):
    """A device fault mid-TRACKING must not cost the target: the session
    recovers the backend, re-seeds the template from the last confirmed
    box (machine.py _process_tracking), and the Lost ramp re-acquires —
    instead of limping 'tracker not initialised' to the 60-frame
    auto-reset (recover() drops TrackState and with it the template)."""
    from gstreamer_vit_tracker_tpu.tracker import core

    params = vittrack.init_params(jax.random.PRNGKey(42), CORR)
    clean = SyntheticSource(320, 256, obj_size=48, seed=3)
    backend = JaxTrackerBackend(params, CORR)
    logs = []
    sess = TrackerSession(backend, 320, 256, SessionConfig(),
                          log=logs.append)
    bbox0 = tuple(int(v) for v in clean.bbox_at(0))
    backend.init(clean.frame_rgb(0), bbox0)
    b, score, ok = backend.update(clean.frame_rgb(0))
    sess.current_bbox = b
    sess.current_score = score
    sess.state = "tracking"

    real = core.update_packed_jit
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("DEVICE_LOST: relay aborted (injected)")
        return real(*a, **k)

    monkeypatch.setattr(core, "update_packed_jit", flaky)
    states = []
    for i in range(1, 10):
        sess.process_frame(clean.frame_rgb(i))
        states.append(sess.state_name())
    assert "LOST" in states, states            # the fault dropped us Lost
    assert states[-1] == "TRACKING", states    # ...and we re-acquired
    assert not any("not initialised" in m for m in logs), logs


def test_app_loop_recovers_from_backend_crash(monkeypatch, capsys):
    """Kill the device backend mid-run: update_packed_jit raises for a few
    frames (simulating the relay ABORTED faults).  The app loop must
    re-create the backend, ride Lost/auto-reset, and end the run alive —
    exceeding the reference, which exits on pipeline errors
    (main.rs:56-65)."""
    from gstreamer_vit_tracker_tpu.app import main as app_main
    from gstreamer_vit_tracker_tpu.tracker import core

    real = core.update_packed_jit
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if 10 <= calls["n"] < 13:
            raise RuntimeError("DEVICE_LOST: relay aborted (injected)")
        return real(*a, **k)

    monkeypatch.setattr(core, "update_packed_jit", flaky)
    rc = app_main.main(["--headless", "--frames", "100", "--no-pace",
                        "--model", "corr-tiny", "--width", "160",
                        "--height", "128", "--cpu"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "DEVICE_LOST" in out                  # faults actually fired
    assert "Unrecoverable" not in out            # ...and were recovered
    assert "Done: 100 frames" in out             # the loop ran to the end
    # Session ends in a live state (selection re-armed via the Lost
    # auto-reset after the backend rebuilt its device state), not crashed.
    assert ("final state TRACKING" in out or "final state SELECT" in out
            or "final state LOST" in out)


def test_app_loop_recovers_from_hud_device_fault(monkeypatch, capsys):
    """Device faults OUTSIDE the tracker (HUD render / sink) hit the
    app-level recovery: backend re-created, session forced Lost, run
    completes."""
    from gstreamer_vit_tracker_tpu.app import main as app_main
    from gstreamer_vit_tracker_tpu.ops import overlay

    real = overlay.render_hud
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if 10 <= calls["n"] < 13:
            raise RuntimeError("DEVICE_LOST: hud render (injected)")
        return real(*a, **k)

    monkeypatch.setattr(overlay, "render_hud", flaky)
    rc = app_main.main(["--headless", "--frames", "100", "--no-pace",
                        "--model", "corr-tiny", "--width", "160",
                        "--height", "128", "--cpu"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "DEVICE_LOST" in out
    assert "Frame " in out and "error" in out    # app-level handler fired
    assert "Unrecoverable" not in out
    assert "Done: 100 frames" in out


def test_app_loop_gives_up_after_persistent_faults(monkeypatch, capsys):
    """A permanently dead device must terminate the run with the
    unrecoverable message instead of spinning forever."""
    from gstreamer_vit_tracker_tpu.app import main as app_main
    from gstreamer_vit_tracker_tpu.ops import overlay

    def dead(*a, **k):
        raise RuntimeError("DEVICE_LOST: permanent (injected)")

    monkeypatch.setattr(overlay, "render_hud", dead)
    rc = app_main.main(["--headless", "--frames", "500", "--no-pace",
                        "--model", "corr-tiny", "--width", "160",
                        "--height", "128", "--cpu"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Unrecoverable" in out
    assert "Done: 500 frames" not in out         # terminated early
