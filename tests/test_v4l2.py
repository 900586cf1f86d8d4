"""V4L2 stack unit tests: ioctl codes + struct layouts + negotiation logic.

No camera exists in CI, but the kernel ABI is testable without one: the
ioctl request numbers encode the struct sizes, so pinning them against the
canonical 64-bit values from linux/videodev2.h proves every ctypes layout
in media/v4l2.py is byte-correct (a wrong field offset would change the
size and therefore the code).  A live capture test runs only when a
/dev/video* node is present (reference caps: pipeline_ir.rs:27-41).
"""

import ctypes
import glob
import os

import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.media import v4l2


def test_fourcc():
    assert v4l2.fourcc("YUYV") == 0x56595559
    assert v4l2.fourcc("NV12") == 0x3231564E
    assert v4l2.PIX_FMT_YUYV == 0x56595559


def test_struct_sizes_64bit():
    """Canonical x86_64/aarch64 sizeofs from linux/videodev2.h."""
    assert ctypes.sizeof(v4l2.v4l2_pix_format) == 48
    assert ctypes.sizeof(v4l2.v4l2_format) == 208
    assert ctypes.sizeof(v4l2.v4l2_requestbuffers) == 20
    assert ctypes.sizeof(v4l2.v4l2_buffer) == 88
    assert ctypes.sizeof(v4l2.v4l2_streamparm) == 204


def test_ioctl_codes_match_kernel_headers():
    """The canonical request numbers (64-bit) — e.g. `printf VIDIOC_S_FMT`
    in kernel docs / strace output."""
    assert v4l2.VIDIOC_S_FMT == 0xC0D05605
    assert v4l2.VIDIOC_REQBUFS == 0xC0145608
    assert v4l2.VIDIOC_QUERYBUF == 0xC0585609
    assert v4l2.VIDIOC_QBUF == 0xC058560F
    assert v4l2.VIDIOC_DQBUF == 0xC0585611
    assert v4l2.VIDIOC_STREAMON == 0x40045612
    assert v4l2.VIDIOC_STREAMOFF == 0x40045613
    assert v4l2.VIDIOC_S_PARM == 0xC0CC5616


def test_buffer_m_union_offset():
    """The mmap offset lives in the m union at byte 64 (after timestamp /
    timecode); a layout slip here maps the wrong kernel pages."""
    assert v4l2.v4l2_buffer.m.offset == 64
    assert v4l2.v4l2_buffer.length.offset == 72


def test_negotiate_writes_back(monkeypatch):
    """S_FMT semantics: the driver may adjust the geometry; negotiate()
    must adopt the written-back values and reject a refused pixelformat."""
    cap = v4l2.V4L2Capture("/dev/null", 640, 512)
    cap._fd = 99  # never actually used — ioctl is stubbed

    def fake_ioctl(code, arg):
        assert code == v4l2.VIDIOC_S_FMT
        # Driver adjusts to its nearest mode and reports sizeimage.
        arg.fmt.pix.width = 640
        arg.fmt.pix.height = 480
        arg.fmt.pix.sizeimage = 640 * 480 * 2

    monkeypatch.setattr(cap, "_ioctl", fake_ioctl)
    w, h, size = cap.negotiate()
    assert (w, h, size) == (640, 480, 640 * 480 * 2)
    assert (cap.width, cap.height) == (640, 480)

    def refuse(code, arg):
        arg.fmt.pix.pixelformat = v4l2.PIX_FMT_NV12

    monkeypatch.setattr(cap, "_ioctl", refuse)
    with pytest.raises(RuntimeError, match="refused pixelformat"):
        cap.negotiate()


@pytest.mark.skipif(not glob.glob("/dev/video*"),
                    reason="no V4L2 device present")
def test_live_capture():
    dev = sorted(glob.glob("/dev/video*"))[0]
    with v4l2.V4L2Capture(dev, 640, 480) as cap:
        frame = cap.read_frame()
        assert frame.dtype == np.uint8
        assert frame.size > 0


@pytest.mark.skipif(os.path.exists("/dev/video21"),
                    reason="camera present; the FileNotFoundError path "
                           "does not apply")
def test_source_requires_device():
    from gstreamer_vit_tracker_tpu.media.source import V4L2Source

    with pytest.raises(FileNotFoundError):
        V4L2Source("/dev/video21")


def test_fourcc_mjpeg():
    assert v4l2.PIX_FMT_MJPEG == v4l2.fourcc("MJPG") == 0x47504A4D


def test_v4l2source_mjpeg_decodes(monkeypatch):
    """MJPEG capture mode: variable-length JPEG buffers from DQBUF decode
    to RGB frames (most USB cameras' >30fps mode)."""
    from gstreamer_vit_tracker_tpu.media import source as source_mod
    from gstreamer_vit_tracker_tpu.media.sink import _encode_jpeg

    yy = np.arange(120, dtype=np.float32)[:, None]
    xx = np.arange(160, dtype=np.float32)[None, :]
    rgb = np.stack([(yy + xx) % 256, (xx * 1.5 + 0 * yy) % 256,
                    (yy + 0 * xx) % 256], axis=-1).astype(np.uint8)
    jpg = np.frombuffer(_encode_jpeg(rgb, 95), np.uint8)

    class FakeCap:
        def __init__(self, device, width, height, fps=60,
                     pixelformat=0, n_buffers=4):
            assert pixelformat == v4l2.PIX_FMT_MJPEG
            self.width, self.height = width, height

        def start(self):
            pass

        def read_frame(self, timeout=2.0):
            return jpg.copy()

        def stop(self):
            pass

    monkeypatch.setattr(source_mod.os.path, "exists", lambda p: True)
    monkeypatch.setattr(v4l2, "V4L2Capture", FakeCap)
    src = source_mod.V4L2Source("/dev/videoX", 160, 120, pixfmt="mjpeg")
    assert src.fmt == "rgb"
    frame = src.frame(0)
    assert frame.shape == (120, 160, 3)
    assert np.abs(frame.astype(int) - rgb.astype(int)).mean() < 4.0
    src.close()


def test_v4l2source_rejects_bad_pixfmt(monkeypatch):
    from gstreamer_vit_tracker_tpu.media import source as source_mod

    monkeypatch.setattr(source_mod.os.path, "exists", lambda p: True)
    with pytest.raises(ValueError, match="pixfmt"):
        source_mod.V4L2Source("/dev/videoX", pixfmt="rgb24")
