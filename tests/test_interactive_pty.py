"""End-to-end interactive drive through a real pty.

Round-1 gap: the keyboard -> selection -> init -> track flow was only
verified by hand.  This spawns the actual app (NOT --headless) on a pty,
types the reference key protocol (move fast T/F/G/H, Enter to latch each
corner, Q to quit; raw_mode_guard.rs:65-101), and asserts the session
walks SELECT START -> SELECT END -> TRACKING and exits cleanly.
"""

import os
import pty
import select
import subprocess
import sys
import threading
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_interactive_select_and_track():
    master, slave = pty.openpty()
    proc = subprocess.Popen(
        [sys.executable, "-m", "gstreamer_vit_tracker_tpu.app.main",
         "--cpu", "--model", "corr-tiny", "--width", "320", "--height",
         "256", "--speed", "0", "--frames", "3000", "--no-pace"],
        stdin=slave, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=REPO, text=False)
    os.close(slave)

    out = bytearray()
    done = threading.Event()

    def drain():
        while True:
            chunk = proc.stdout.read(256)
            if not chunk:
                break
            out.extend(chunk)
        done.set()

    t = threading.Thread(target=drain, daemon=True)
    t.start()

    def wait_for(needle: bytes, timeout: float) -> bool:
        deadline = time.time() + timeout
        while time.time() < deadline:
            if needle in out:
                return True
            if proc.poll() is not None:
                return needle in out
            time.sleep(0.1)
        return False

    def key(ch: bytes, settle: float = 0.25):
        os.write(master, ch)
        time.sleep(settle)

    try:
        # Keyboard thread is up once the banner prints.
        assert wait_for(b"KEYBOARD CONTROLS", 90), out.decode(errors="replace")
        # Target sits at frame centre (speed 0); cursor starts there too.
        # First corner: fast-move up-left (T=up, F=left, 50 px each).
        key(b"t")
        key(b"f")
        key(b"\r")                      # latch first corner
        assert wait_for(b"Start point set", 30), out.decode(errors="replace")
        # Second corner: fast-move down-right twice (100 px box).
        key(b"h")
        key(b"h")
        key(b"g")
        key(b"g")
        key(b"\r")                      # confirm -> tracker.init + validate
        assert wait_for(b"*** TRACKING STARTED! ***", 60), \
            out.decode(errors="replace")
        key(b"q")                       # quit
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
        os.close(master)
        done.wait(5)

    text = out.decode(errors="replace")
    assert "Init result: score=" in text
    assert "Done:" in text
    assert "TRACKING" in text


@pytest.mark.slow
def test_interactive_multi_object_select_and_track():
    """--objects 2: the sequential selection flow arms slot after slot
    (same two-phase key protocol), both targets then advance in one
    batched update per frame, and the HUD state walks to TRACKING 2 OF 2.
    Both selections land on the centre target (deterministic high score);
    the point is the multi-slot machinery, not association."""
    master, slave = pty.openpty()
    proc = subprocess.Popen(
        [sys.executable, "-m", "gstreamer_vit_tracker_tpu.app.main",
         "--cpu", "--model", "corr-tiny", "--width", "320", "--height",
         "256", "--speed", "0", "--frames", "3000", "--no-pace",
         "--objects", "2"],
        stdin=slave, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=REPO, text=False)
    os.close(slave)

    out = bytearray()
    done = threading.Event()

    def drain():
        while True:
            chunk = proc.stdout.read(256)
            if not chunk:
                break
            out.extend(chunk)
        done.set()

    threading.Thread(target=drain, daemon=True).start()

    def wait_for(needle: bytes, timeout: float) -> bool:
        deadline = time.time() + timeout
        while time.time() < deadline:
            if needle in out:
                return True
            if proc.poll() is not None:
                return needle in out
            time.sleep(0.1)
        return False

    def key(ch: bytes, settle: float = 0.25):
        os.write(master, ch)
        time.sleep(settle)

    def select_centre_box(obj: int):
        key(b"t")
        key(b"f")
        key(b"\r")
        assert wait_for(f"Object {obj}: start point set".encode(), 30), \
            out.decode(errors="replace")
        key(b"h")
        key(b"h")
        key(b"g")
        key(b"g")
        key(b"\r")
        assert wait_for(f"TRACKING object {obj}".encode(), 60), \
            out.decode(errors="replace")

    try:
        assert wait_for(b"KEYBOARD CONTROLS", 90), out.decode(errors="replace")
        select_centre_box(1)
        select_centre_box(2)
        key(b"q")
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
        os.close(master)
        done.wait(5)

    text = out.decode(errors="replace")
    assert "TRACKING object 1" in text
    assert "TRACKING object 2" in text
    assert "TRACKING 2 OF 2" in text
