"""MJPEG-over-HTTP network source (media/mjpeg.py).

The network analog of the reference's live V4L2 capture
(/root/reference/src/pipeline_ir.rs:21-41): an IP camera serving
multipart/x-mixed-replace JPEG.  Round-trips against this framework's own
MJPEGSink (Content-Length framing) and against a hand-rolled length-less
camera-style server (JPEG EOI scanning), then end to end through the app.
"""

import threading
import time

import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.media.mjpeg import MJPEGSource, decode_jpeg
from gstreamer_vit_tracker_tpu.media.sink import MJPEGSink, _encode_jpeg


def _frames(n, h=64, w=96, seed=0):
    # Smooth content: JPEG error on white noise is unbounded-ish even at
    # q95; gradients keep the lossy round-trip tight so the assert is on
    # correctness (channel order, framing), not codec entropy.
    yy = np.arange(h, dtype=np.float32)[:, None]
    xx = np.arange(w, dtype=np.float32)[None, :]
    base = np.stack([(yy * 2 + xx + 10 * seed) % 256,
                     (xx * 2.5 + 0 * yy) % 256,
                     (yy * 1.5 + 30 + 0 * xx) % 256],
                    axis=-1).astype(np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        f[:, : (i + 1) * 8, :] = (20 * i) % 255     # frame-distinct band
        out.append(f)
    return out


def _feed(sink, frames, period=0.05, delay=0.2):
    def run():
        time.sleep(delay)
        for f in frames:
            sink.write(f)
            time.sleep(period)
    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def test_roundtrip_against_mjpeg_sink():
    sink = MJPEGSink(port=0, quality=95)
    frames = _frames(6)
    feeder = _feed(sink, frames)
    try:
        src = MJPEGSource(f"http://127.0.0.1:{sink.port}/", timeout=10.0)
        assert (src.height, src.width) == (64, 96)
        assert src.fmt == "rgb"
        got = [src.frame(i) for i in range(3)]
        src.close()
    finally:
        feeder.join(timeout=5.0)
        sink.close()
    for g in got:
        assert g.shape == (64, 96, 3) and g.dtype == np.uint8
        # JPEG is lossy: match the nearest original frame, closely.
        err = min(np.abs(g.astype(int) - f.astype(int)).mean()
                  for f in frames)
        assert err < 4.0, f"decoded frame differs from any original: {err}"
    # The live stream advanced: we did not read the same frame thrice.
    assert any(np.abs(got[0].astype(int) - g.astype(int)).mean() > 1.0
               for g in got[1:])


def test_lengthless_camera_framing():
    """Many IP cameras omit Content-Length: the source must scan for the
    JPEG end-of-image marker instead."""
    import http.server

    frames = _frames(3, seed=1)
    jpgs = [_encode_jpeg(f, 95) for f in frames]

    class Cam(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type",
                             "multipart/x-mixed-replace; boundary=myb")
            self.end_headers()
            for jpg in jpgs:
                self.wfile.write(b"--myb\r\n"
                                 b"Content-Type: image/jpeg\r\n\r\n"
                                 + jpg + b"\r\n")
            self.wfile.write(b"--myb--\r\n")
            # No Content-Length on the response: the body is delimited by
            # connection close; make the server actually close it.
            self.close_connection = True

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Cam)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        src = MJPEGSource(f"http://127.0.0.1:{server.server_address[1]}/",
                          timeout=10.0)
        got = [src.frame(i) for i in range(3)]
        with pytest.raises(EOFError):
            src.frame(3)
        src.close()
    finally:
        server.shutdown()
        server.server_close()
    for g, f in zip(got, frames):
        err = np.abs(g.astype(int) - f.astype(int)).mean()
        assert err < 4.0


def test_sink_close_delivers_clean_eof():
    """MJPEGSink.close() must FIN the live client so a downstream
    MJPEGSource sees clean end-of-input (EOFError), not a read timeout.
    HTTP/1.1 keep-alive would otherwise hold the socket open after the
    handler returns — the bug this pins: a multipart stream is
    connection-delimited, so stream end == connection close."""
    sink = MJPEGSink(port=0, quality=95)
    frames = _frames(4)
    stop = threading.Event()

    def feed():
        i = 0
        while not stop.is_set():
            sink.write(frames[i % len(frames)])
            i += 1
            time.sleep(0.02)
    t = threading.Thread(target=feed, daemon=True)
    t.start()
    src = MJPEGSource(f"http://127.0.0.1:{sink.port}/", timeout=10.0)
    src.frame(0)
    stop.set()
    t.join(timeout=5.0)
    sink.close()
    # Drain whatever was already buffered in flight, then expect EOF —
    # quickly (FIN), not after the 10 s socket timeout.
    t0 = time.monotonic()
    with pytest.raises(EOFError):
        for i in range(1, 50):
            src.frame(i)
    assert time.monotonic() - t0 < 5.0, "EOF came from timeout, not FIN"
    src.close()


def test_decode_jpeg_roundtrip():
    f = _frames(1)[0]
    g = decode_jpeg(_encode_jpeg(f, 95))
    assert g.shape == f.shape
    assert np.abs(g.astype(int) - f.astype(int)).mean() < 4.0


def test_rejects_non_mjpeg_and_bad_scheme():
    import http.server

    class Plain(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = b"hello"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Plain)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with pytest.raises(ValueError, match="not an MJPEG stream"):
            MJPEGSource(f"http://127.0.0.1:{server.server_address[1]}/")
    finally:
        server.shutdown()
        server.server_close()
    with pytest.raises(ValueError, match="http"):
        MJPEGSource("rtsp://camera/stream")


def test_gst_chain_maps_to_mjpeg_source():
    from gstreamer_vit_tracker_tpu.media.gst import parse_launch

    spec = parse_launch(
        "souphttpsrc location=http://10.0.0.9:8080/stream ! "
        "multipartdemux ! jpegdec ! identity ! fakesink")
    assert spec.source == "mjpeg"
    assert spec.input_path == "http://10.0.0.9:8080/stream"
    with pytest.raises(ValueError, match="location"):
        parse_launch("souphttpsrc ! multipartdemux ! fakesink")


def test_app_stops_cleanly_when_stream_ends(tmp_path):
    """A network stream that ends (camera gone for good) is end-of-input:
    the app stops cleanly instead of spinning the fault-recovery loop."""
    import http.server

    from gstreamer_vit_tracker_tpu.app import main as app_main

    frames = _frames(4, h=128, w=160, seed=2)
    jpgs = [_encode_jpeg(f, 95) for f in frames]

    class Cam(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type",
                             "multipart/x-mixed-replace; boundary=b")
            self.end_headers()
            for jpg in jpgs:
                self.wfile.write(b"--b\r\nContent-Length: "
                                 + str(len(jpg)).encode() + b"\r\n\r\n"
                                 + jpg + b"\r\n")
            self.close_connection = True

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Cam)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    traj = tmp_path / "ended.jsonl"
    try:
        rc = app_main.main([
            "--source", "mjpeg", "--input",
            f"http://127.0.0.1:{server.server_address[1]}/",
            "--headless", "--frames", "50", "--no-pace", "--cpu",
            "--init-bbox", "40,40,48,48", "--record-track", str(traj),
        ])
    finally:
        server.shutdown()
        server.server_close()
    assert rc == 0
    # 1 init frame + 3 streamed updates, then clean stop (well before 50).
    lines = traj.read_text().strip().splitlines()
    assert 1 <= len(lines) <= 4


def test_app_tracks_from_network_stream(tmp_path):
    """End to end: synthetic frames -> MJPEGSink (one process's preview)
    -> HTTP -> MJPEGSource -> the app tracks headlessly."""
    from gstreamer_vit_tracker_tpu.app import main as app_main
    from gstreamer_vit_tracker_tpu.media.source import SyntheticSource

    sink = MJPEGSink(port=0, quality=95)
    syn = SyntheticSource(320, 256, fps=30, seed=3, speed=1.0)
    stop = threading.Event()

    def run():
        i = 0
        while not stop.is_set() and i < 400:
            sink.write(syn.frame(i))
            i += 1
            time.sleep(0.03)

    feeder = threading.Thread(target=run, daemon=True)
    feeder.start()
    traj = tmp_path / "net.jsonl"
    try:
        rc = app_main.main([
            "--source", "mjpeg", "--input",
            f"http://127.0.0.1:{sink.port}/",
            "--headless", "--frames", "10", "--no-pace", "--cpu",
            "--init-bbox", "128,96,64,64",
            "--record-track", str(traj),
        ])
    finally:
        stop.set()
        feeder.join(timeout=5.0)
        sink.close()
    assert rc == 0
    lines = traj.read_text().strip().splitlines()
    assert len(lines) == 10


class _RstCam:
    """Raw-socket HTTP MJPEG server that serves N parts per connection,
    then RESETS the connection (SO_LINGER 0, close without shutdown) — a
    camera hiccup, not a clean end.  http.server can't simulate this: its
    shutdown_request sends a clean FIN before closing."""

    def __init__(self, frames, per_conn=3, grace=0.5):
        import socket

        self._jpgs = [_encode_jpeg(f, 95) for f in frames]
        self._per_conn = per_conn
        self._grace = grace
        self._sock = socket.create_server(("127.0.0.1", 0))
        self._sock.settimeout(0.5)
        self.port = self._sock.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        import socket
        import struct

        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            try:
                conn.recv(65536)                      # the GET request
                body = b"".join(
                    b"--b\r\nContent-Length: %d\r\n\r\n%s\r\n"
                    % (len(j), j) for j in self._jpgs[:self._per_conn])
                conn.sendall(
                    b"HTTP/1.1 200 OK\r\nContent-Type: "
                    b"multipart/x-mixed-replace; boundary=b\r\n\r\n" + body)
                time.sleep(self._grace)   # let the client drain the parts
                conn.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                                struct.pack("ii", 1, 0))   # close -> RST
            except OSError:
                pass
            finally:
                conn.close()

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=3.0)
        self._sock.close()


def test_reopen_recovers_from_connection_reset():
    frames = _frames(3, seed=4)
    cam = _RstCam(frames, per_conn=2)
    try:
        src = MJPEGSource(f"http://127.0.0.1:{cam.port}/", timeout=10.0)
        a = src.frame(0)
        b = src.frame(1)
        assert a.shape == b.shape == frames[0].shape
        # The RST mid-stream is a transport FAULT (OSError family), not a
        # clean end-of-input (EOFError) — callers must see the difference.
        with pytest.raises(OSError):
            for i in range(2, 10):
                src.frame(i)
        src.reopen()
        c = src.frame(0)
        assert c.shape == frames[0].shape
        src.close()
    finally:
        cam.shutdown()


def test_app_reconnects_through_camera_hiccups(tmp_path):
    """The fault-recovery loop reopens a network source after a reset:
    a camera hiccup costs frames, never the run."""
    from gstreamer_vit_tracker_tpu.app import main as app_main

    frames = _frames(3, h=128, w=160, seed=5)
    cam = _RstCam(frames, per_conn=3)
    traj = tmp_path / "hiccup.jsonl"
    try:
        rc = app_main.main([
            "--source", "mjpeg", "--input", f"http://127.0.0.1:{cam.port}/",
            "--headless", "--frames", "8", "--no-pace", "--cpu",
            "--init-bbox", "40,40,48,48", "--record-track", str(traj),
        ])
    finally:
        cam.shutdown()
    assert rc == 0
    # Progress across (at least) one reconnect: more tracked frames than a
    # single 3-part connection could provide, faults never terminal.
    lines = traj.read_text().strip().splitlines()
    assert len(lines) >= 4
    # A transport fault must not cost the target: the tracker state is
    # intact across the reconnect (the app must NOT re-create the backend
    # for a source-side fault), so every frame after the hiccup is still
    # TRACKING on this static content — no 'tracker not initialised'
    # limp, no detour through selection.
    import json

    states = [json.loads(ln)["state"] for ln in lines]
    assert states[-1] == "TRACKING", states
    assert all(s == "TRACKING" for s in states[1:]), states
