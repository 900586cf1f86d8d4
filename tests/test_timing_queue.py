"""Timing-stats parity (timing_stats.rs semantics) and leaky-queue tests."""

import threading

from gstreamer_vit_tracker_tpu.media.queue import FrameQueue
from gstreamer_vit_tracker_tpu.utils.timing import TimingStats


def test_fps_from_mean_interval():
    t = TimingStats()
    assert t.fps() == 0.0                      # empty window (rs:37-39)
    for _ in range(10):
        t.add_interval(16_667)                 # ~60 fps
    assert abs(t.fps() - 60.0) < 0.1


def test_rolling_window_drops_oldest():
    t = TimingStats(window=120)
    for _ in range(120):
        t.add_interval(10_000)
    for _ in range(120):
        t.add_interval(20_000)                 # fully displaces the old window
    assert abs(t.fps() - 50.0) < 0.1


def test_avg_ms():
    t = TimingStats()
    t.add_times(1500, 2500)
    t.add_times(2500, 7500)
    assert abs(t.avg_conv_ms() - 2.0) < 1e-9
    assert abs(t.avg_track_ms() - 5.0) < 1e-9
    assert t.p50_track_ms() > 0


def test_queue_drop_oldest():
    q = FrameQueue(max_buffers=3)
    for i in range(5):
        q.push(i)
    assert len(q) == 3
    assert q.dropped == 2
    # Oldest were dropped: remaining are 2, 3, 4.
    assert q.try_pop() == 2
    assert q.try_pop() == 3
    assert q.try_pop() == 4
    assert q.try_pop() is None


def test_queue_never_blocks_producer():
    q = FrameQueue(max_buffers=2)
    done = threading.Event()

    def producer():
        for i in range(1000):
            q.push(i)
        done.set()

    threading.Thread(target=producer).start()
    assert done.wait(5.0), "producer stalled — leaky queue must never block"
    assert len(q) == 2


def test_queue_pop_timeout():
    q = FrameQueue(max_buffers=2)
    assert q.pop(timeout=0.05) is None
    q.push("x")
    assert q.pop(timeout=0.05) == "x"
