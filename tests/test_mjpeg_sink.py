"""MJPEG preview sink: HTTP multipart stream with newest-frame semantics.

Display analog of the reference's ``kmssink sync=false`` + leaky queue
(/root/reference/src/pipeline_ir.rs:75-84): the viewer pulls the newest
frame; the write path never blocks on the viewer.
"""

import http.client
import threading
import time

import numpy as np

from gstreamer_vit_tracker_tpu.media.sink import (MJPEGSink, MultiSink,
                                                  NullSink)


def _read_one_part(resp) -> bytes:
    """Read one multipart JPEG part body from the streaming response."""
    # boundary line
    line = resp.fp.readline()
    while line.strip() in (b"",):
        line = resp.fp.readline()
    assert line.strip() == b"--frame", line
    headers = {}
    while True:
        line = resp.fp.readline()
        if line.strip() == b"":
            break
        k, _, v = line.decode().partition(":")
        headers[k.strip().lower()] = v.strip()
    n = int(headers["content-length"])
    body = resp.fp.read(n)
    resp.fp.readline()   # trailing \r\n
    return body


def test_mjpeg_sink_streams_newest_frame():
    sink = MJPEGSink(port=0, max_fps=1000.0)
    try:
        rng = np.random.default_rng(0)
        frame0 = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
        sink.write(frame0)
        assert sink.frames == 1

        conn = http.client.HTTPConnection("127.0.0.1", sink.port, timeout=5)
        conn.request("GET", "/")
        resp = conn.getresponse()
        assert resp.status == 200
        assert "multipart/x-mixed-replace" in resp.headers["Content-Type"]

        jpg = _read_one_part(resp)
        assert jpg[:2] == b"\xff\xd8"          # JPEG SOI
        assert jpg[-2:] == b"\xff\xd9"         # JPEG EOI

        # Writer keeps going while the client reads: newest frame wins.
        stop = threading.Event()

        def writer():
            i = 0
            while not stop.is_set():
                f = np.full((32, 48, 3), i % 255, np.uint8)
                sink.write(f)
                i += 1
                time.sleep(0.002)

        t = threading.Thread(target=writer, daemon=True)
        t.start()
        try:
            jpg2 = _read_one_part(resp)
            assert jpg2[:2] == b"\xff\xd8"
        finally:
            stop.set()
            t.join(timeout=2)
        conn.close()
    finally:
        sink.close()


def test_mjpeg_sink_404_and_luma():
    sink = MJPEGSink(port=0)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", sink.port, timeout=5)
        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
        conn.close()

        # Grayscale (NV12 luma HUD path) frames encode too.
        sink.write(np.zeros((32, 48), np.uint8))
        conn = http.client.HTTPConnection("127.0.0.1", sink.port, timeout=5)
        conn.request("GET", "/stream")
        resp = conn.getresponse()
        jpg = _read_one_part(resp)
        assert jpg[:2] == b"\xff\xd8"
        conn.close()
    finally:
        sink.close()


def test_mjpeg_client_before_first_frame_and_close():
    """A client connecting before any write must block (not busy-spin)
    until the first frame arrives; close() must release handler threads."""
    sink = MJPEGSink(port=0, max_fps=1000.0)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", sink.port, timeout=10)
        conn.request("GET", "/")
        resp = conn.getresponse()
        assert resp.status == 200
        time.sleep(0.3)                     # handler waits, no frame yet
        sink.write(np.full((16, 24, 3), 7, np.uint8))
        jpg = _read_one_part(resp)
        assert jpg[:2] == b"\xff\xd8"
        n_before = threading.active_count()
        sink.close()
        time.sleep(0.5)
        # the handler thread must have exited after close()
        assert threading.active_count() < n_before
        conn.close()
    finally:
        try:
            sink.close()
        except Exception:
            pass


def test_multisink_fans_out_and_reports_host_pixels():
    a, b = NullSink(), NullSink()
    ms = MultiSink(a, b, None)
    ms.write(np.zeros((4, 4), np.uint8))
    assert a.frames == 1 and b.frames == 1 and ms.frames == 1
    assert ms.wants_host_pixels is False

    from gstreamer_vit_tracker_tpu.media.sink import FileSink

    ms2 = MultiSink(NullSink(), FileSink("/tmp/_unused.npy"))
    assert ms2.wants_host_pixels is True
