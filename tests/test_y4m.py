"""Y4M (YUV4MPEG2) file IO: round-trip, foreign headers, app wiring.

Gives the framework real recorded-video input/output (the reference's
live-camera pipeline caps, /root/reference/src/pipeline_ir.rs:21-41, have
no file analog there); `ffmpeg -i clip.mp4 out.y4m` is the on-ramp.
"""

import io
import os

import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.media.source import (FileSource,
                                                    SyntheticSource)
from gstreamer_vit_tracker_tpu.media.sink import FileSink
from gstreamer_vit_tracker_tpu.media.y4m import (Y4MReader, Y4MWriter,
                                                 write_y4m_rgb)


def test_roundtrip_rgb_to_y4m_to_nv12(tmp_path):
    src = SyntheticSource(64, 48, obj_size=16, seed=1)
    frames = np.stack([src.frame_rgb(i) for i in range(5)])
    path = str(tmp_path / "clip.y4m")
    write_y4m_rgb(path, frames, fps=60.0)

    r = Y4MReader(path)
    assert (r.width, r.height, r.num_frames) == (64, 48, 5)
    assert r.fps == 60.0
    y, uv = r.frame_nv12(2)
    assert y.shape == (48, 64) and uv.shape == (24, 32, 2)
    # The Y plane matches the direct forward conversion bit-for-bit.
    from gstreamer_vit_tracker_tpu.media.source import rgb_to_nv12_planes

    y_ref, uv_ref = rgb_to_nv12_planes(frames[2])
    assert np.array_equal(y, y_ref)
    assert np.array_equal(uv, uv_ref)
    r.close()


def test_reader_handles_foreign_header_and_frame_params(tmp_path):
    """Files from other producers carry extra header tags, odd parameter
    order, and per-FRAME parameters — all must parse."""
    h, w = 32, 48
    rng = np.random.default_rng(0)
    planes = [rng.integers(0, 256, (h * w + 2 * (h // 2) * (w // 2),),
                           dtype=np.uint8) for _ in range(3)]
    buf = io.BytesIO()
    buf.write(b"YUV4MPEG2 C420mpeg2 W48 H32 F30000:1001 Ip A128:117 "
              b"XYSCSS=420MPEG2\n")
    for i, p in enumerate(planes):
        buf.write(b"FRAME" + (b" Xsome=param" if i == 1 else b"") + b"\n")
        buf.write(p.tobytes())
    path = str(tmp_path / "foreign.y4m")
    with open(path, "wb") as f:
        f.write(buf.getvalue())

    r = Y4MReader(path)
    assert (r.width, r.height) == (48, 32)
    assert abs(r.fps - 29.97) < 0.01
    assert r.num_frames == 3
    y, u, v = r.frame_planes(1)
    assert np.array_equal(y.ravel(), planes[1][:h * w])
    r.close()


def test_reader_rejects_non_420(tmp_path):
    path = str(tmp_path / "c444.y4m")
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W16 H16 F25:1 C444\n")
    with pytest.raises(ValueError, match="4:2:0"):
        Y4MReader(path)


def test_reader_ignores_truncated_tail_frame(tmp_path):
    path = str(tmp_path / "trunc.y4m")
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W16 H16 F25:1\n")
        f.write(b"FRAME\n" + bytes(16 * 16 * 3 // 2))
        f.write(b"FRAME\n" + bytes(10))     # torn write / interrupted copy
    r = Y4MReader(path)
    assert r.num_frames == 1
    r.close()


def test_filesource_plays_y4m_as_nv12(tmp_path):
    src = SyntheticSource(64, 48, obj_size=16, seed=2)
    path = str(tmp_path / "clip.y4m")
    write_y4m_rgb(path, np.stack([src.frame_rgb(i) for i in range(4)]),
                  fps=25.0)
    fs = FileSource(path)
    assert fs.fmt == "nv12"
    assert (fs.width, fs.height, fs.num_frames) == (64, 48, 4)
    assert fs.fps == 25.0
    y, uv = fs.frame(3)
    assert y.shape == (48, 64) and uv.shape == (24, 32, 2)
    looped = FileSource(path, loop=True)
    y2, _ = looped.frame(7)   # 7 % 4 == 3
    assert np.array_equal(y, y2)


def test_filesink_streams_y4m(tmp_path):
    path = str(tmp_path / "rec.y4m")
    sink = FileSink(path, fps=60.0)
    src = SyntheticSource(64, 48, obj_size=16, seed=3)
    for i in range(3):
        sink.write(src.frame_rgb(i))
    sink.close()
    assert sink.frames == 3
    r = Y4MReader(path)
    assert r.num_frames == 3 and (r.width, r.height) == (64, 48)
    r.close()
    assert os.path.getsize(path) > 3 * 64 * 48 * 3 // 2


def test_filesink_streams_luma_y4m(tmp_path):
    """2D luma frames (the app's nv12 display path: HUD composited on the
    Y plane alone) record as grayscale 4:2:0 with neutral chroma — the
    `--format nv12 --record out.y4m` path must not crash."""
    path = str(tmp_path / "luma.y4m")
    sink = FileSink(path, fps=30.0)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (48, 64), np.uint8) for _ in range(3)]
    for f in frames:
        sink.write(f)
    sink.close()
    assert sink.frames == 3
    r = Y4MReader(path)
    assert r.num_frames == 3 and (r.width, r.height) == (64, 48)
    y, uv = r.frame_nv12(1)
    assert np.array_equal(y, frames[1])
    assert (uv == 128).all()
    r.close()


def test_y4m_tracking_end_to_end(tmp_path):
    """A y4m clip tracks through the real NV12 preprocess + tracker core
    (CPU, tiny model) — the '--source file --input clip.y4m' path."""
    import jax
    import jax.numpy as jnp

    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.models import vittrack
    from gstreamer_vit_tracker_tpu.tracker import core

    cfg = ModelConfig(template_size=32, search_size=64, patch_size=16,
                      embed_dim=32, depth=1, num_heads=2,
                      head_mode="corr", dtype="float32")
    src = SyntheticSource(96, 64, obj_size=24, seed=4, speed=1.0)
    path = str(tmp_path / "trk.y4m")
    write_y4m_rgb(path, np.stack([src.frame_rgb(i) for i in range(6)]))
    fs = FileSource(path)
    frame0 = tuple(jnp.asarray(p) for p in fs.frame(0))
    st = core.init(vittrack.init_params(jax.random.PRNGKey(0), cfg),
                   frame0, jnp.asarray(src.bbox_at(0)), cfg,
                   frame_format="nv12")
    params = vittrack.init_params(jax.random.PRNGKey(0), cfg)
    for i in range(1, 6):
        frame = tuple(jnp.asarray(p) for p in fs.frame(i))
        st, bbox, conf = core.update(params, st, frame, cfg,
                                     frame_format="nv12")
    assert np.isfinite(np.asarray(bbox)).all()
    assert np.isfinite(float(conf))


def test_filesource_cv2_container(tmp_path):
    """Compressed containers (.avi MJPG here) decode through FileSource's
    cv2 path: sequential reads, forward skip, back-seek reopen, loop."""
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48))
    assert w.isOpened()
    rng = np.random.default_rng(3)
    frames = []
    for i in range(8):
        # Flat per-frame color: MJPG is lossy, flat blocks survive intact.
        fr = np.full((48, 64, 3), rng.integers(30, 220, size=3), np.uint8)
        frames.append(fr)
        w.write(fr[..., ::-1])          # writer takes BGR
    w.release()

    fs = FileSource(path)
    assert (fs.width, fs.height, fs.fmt) == (64, 48, "rgb")
    assert fs.num_frames == 8
    assert fs.fps == pytest.approx(30.0)

    def close(a, b):
        return np.max(np.abs(a.astype(int) - b.astype(int))) <= 12

    assert close(fs.frame(0), frames[0])
    assert close(fs.frame(3), frames[3])        # forward skip via grab()
    assert close(fs.frame(1), frames[1])        # back-seek reopens
    it = iter(FileSource(path))
    got = [next(it) for _ in range(8)]
    assert all(close(g, f) for g, f in zip(got, frames))

    looped = FileSource(path, loop=True)
    assert close(looped.frame(9), frames[1])


def test_filesink_cv2_container_roundtrip(tmp_path):
    """--record out.avi encodes through FileSink's cv2 path and reads back
    via FileSource; luma-only (nv12 HUD) frames encode as gray."""
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "rec.avi")
    sink = FileSink(path, fps=30.0)
    rng = np.random.default_rng(5)
    frames = [np.full((48, 64, 3), rng.integers(30, 220, size=3), np.uint8)
              for _ in range(4)]
    for fr in frames:
        sink.write(fr)
    sink.close()
    assert sink.frames == 4

    fs = FileSource(path)
    assert fs.num_frames == 4
    for i, fr in enumerate(frames):
        got = fs.frame(i)
        assert np.max(np.abs(got.astype(int) - fr.astype(int))) <= 12

    # Luma-only frames (the nv12 display path) record as gray video.
    gpath = str(tmp_path / "gray.avi")
    gsink = FileSink(gpath, fps=30.0)
    gsink.write(np.full((48, 64), 90, np.uint8))
    gsink.close()
    g = FileSource(gpath).frame(0)
    assert g.shape == (48, 64, 3)
    assert abs(int(g.mean()) - 90) <= 6
