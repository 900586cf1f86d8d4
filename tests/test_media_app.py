"""Media IO round trips and app argparser coverage."""

import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.app.main import PRESETS, build_argparser
from gstreamer_vit_tracker_tpu.media.sink import FileSink
from gstreamer_vit_tracker_tpu.media.source import (FileSource,
                                                    SyntheticSource,
                                                    V4L2Source)


def test_file_source_rgb_roundtrip(tmp_path):
    frames = np.random.default_rng(0).integers(0, 256, (5, 32, 48, 3),
                                               dtype=np.uint8)
    path = str(tmp_path / "clip.npy")
    np.save(path, frames)
    src = FileSource(path)
    assert (src.num_frames, src.height, src.width) == (5, 32, 48)
    np.testing.assert_array_equal(src.frame(2), frames[2])
    assert len(list(iter(src))) == 5


def test_file_source_nv12_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (3, 32, 48), dtype=np.uint8)
    uv = rng.integers(0, 256, (3, 16, 24, 2), dtype=np.uint8)
    path = str(tmp_path / "clip.npz")
    np.savez(path, y=y, uv=uv)
    src = FileSource(path)
    assert src.fmt == "nv12"
    fy, fuv = src.frame(1)
    np.testing.assert_array_equal(fy, y[1])
    np.testing.assert_array_equal(fuv, uv[1])


def test_file_sink_roundtrip(tmp_path):
    path = str(tmp_path / "out.npy")
    sink = FileSink(path)
    for i in range(4):
        sink.write(np.full((8, 8, 3), i, np.uint8))
    sink.close()
    data = np.load(path)
    assert data.shape == (4, 8, 8, 3)
    assert data[3, 0, 0, 0] == 3


def test_v4l2_missing_device_raises():
    # main.rs:34-36 hard-fails on a missing camera; the source mirrors that.
    with pytest.raises(FileNotFoundError):
        V4L2Source("/dev/video_does_not_exist")


def test_synthetic_determinism():
    a = SyntheticSource(64, 48, obj_size=16, seed=7)
    b = SyntheticSource(64, 48, obj_size=16, seed=7)
    np.testing.assert_array_equal(a.frame_rgb(5), b.frame_rgb(5))
    assert a.bbox_at(9) == b.bbox_at(9)


def test_argparser_defaults_and_presets():
    args = build_argparser().parse_args([])
    assert args.source == "synthetic"
    assert args.model in PRESETS
    assert args.fmt == "rgb"
    args = build_argparser().parse_args(
        ["--format", "nv12", "--headless", "--frames", "10", "--cpu"])
    assert args.fmt == "nv12" and args.headless and args.frames == 10
    with pytest.raises(SystemExit):
        build_argparser().parse_args(["--format", "bogus"])


def test_headless_multi_object_exclusive_runs():
    """The full headless app path with --objects 3 --exclusive: slots land
    on the primary + two distractors (distinct targets, so suppression
    stays quiet) and the batched-exclusive update program compiles and
    tracks in-app."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "gstreamer_vit_tracker_tpu.app.main",
         "--headless", "--cpu", "--model", "corr-tiny", "--width", "320",
         "--height", "256", "--frames", "25", "--no-pace",
         "--objects", "3", "--exclusive"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "TRACKING 3 OF 3" in proc.stdout, proc.stdout


def test_headless_record_track_jsonl(tmp_path):
    """--record-track appends one JSON line per frame with state, bbox
    and score — the machine-readable twin of the reference's console
    telemetry (pipeline_ir.rs:210-220)."""
    import json
    import subprocess
    import sys

    out = tmp_path / "traj.jsonl"
    proc = subprocess.run(
        [sys.executable, "-m", "gstreamer_vit_tracker_tpu.app.main",
         "--headless", "--cpu", "--model", "corr-tiny", "--width", "320",
         "--height", "256", "--frames", "15", "--no-pace",
         "--record-track", str(out)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert len(rows) == 15
    assert rows[0]["frame"] == 0 and rows[-1]["frame"] == 14
    for r in rows:
        assert r["state"] == "TRACKING"
        assert len(r["bbox"]) == 4 and r["score"] > 0.25
        assert r["track_ms"] > 0


def test_file_source_init_bbox_demo_flow(tmp_path):
    """The README demo flow: record a clip headless, then track it back
    from the file with --init-bbox (the file-source analog of the
    reference's interactive corner selection, tracker_context.rs:64-115).
    The run must stop cleanly at the file's last frame (EOS analog), not
    ride the fault-recovery path off the end."""
    import json
    import subprocess
    import sys

    clip = tmp_path / "clip.y4m"
    rec = subprocess.run(
        [sys.executable, "-m", "gstreamer_vit_tracker_tpu.app.main",
         "--headless", "--cpu", "--model", "corr-tiny", "--width", "320",
         "--height", "256", "--frames", "12", "--no-pace", "--speed", "1.0",
         "--record", str(clip)],
        capture_output=True, text=True, timeout=300)
    assert rec.returncode == 0, rec.stdout + rec.stderr

    from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
    x, y, w, h = (int(v) for v in
                  SyntheticSource(320, 256, speed=1.0).bbox_at(0))

    out = tmp_path / "traj.jsonl"
    proc = subprocess.run(
        [sys.executable, "-m", "gstreamer_vit_tracker_tpu.app.main",
         "--source", "file", "--input", str(clip), "--headless", "--cpu",
         "--model", "corr-tiny", "--no-pace",
         "--init-bbox", f"{x},{y},{w},{h}",
         "--record-track", str(out)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "error" not in proc.stdout.lower().split("frame 0")[0]
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert len(rows) == 12                      # clean EOF stop
    assert all(r["state"] == "TRACKING" for r in rows)
    # The tracked box must stay on the recorded target, not the centre.
    bx = rows[-1]["bbox"]
    assert abs(bx[0] - x) < 48 and abs(bx[1] - y) < 48


def test_init_bbox_validation():
    """Malformed or sub-minimum --init-bbox exits with an error (the
    20x20 minimum mirrors selection_state.rs:42-43)."""
    import subprocess
    import sys

    for bad in ("1,2,3", "10,10,10,10"):
        proc = subprocess.run(
            [sys.executable, "-m", "gstreamer_vit_tracker_tpu.app.main",
             "--headless", "--cpu", "--model", "corr-tiny", "--frames", "2",
             "--no-pace", "--init-bbox", bad],
            capture_output=True, text=True, timeout=300)
        assert proc.returncode == 2, proc.stdout + proc.stderr
        assert "error: --init-bbox" in proc.stdout


def test_headless_fault_injection_soak_flags():
    """--inject-source-fault / --inject-device-fault / --inject-corrupt
    (the soak harness's hooks, scripts/soak.py): transport faults ride
    the reopen path, device faults the session's recover+re-seed path,
    and the run completes with every fault recovered and the target
    still TRACKING."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "gstreamer_vit_tracker_tpu.app.main",
         "--headless", "--cpu", "--model", "corr-tiny", "--width", "320",
         "--height", "256", "--frames", "150", "--no-pace",
         "--format", "nv12", "--inject-source-fault", "40",
         "--inject-device-fault", "45", "--inject-corrupt", "0"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = proc.stdout
    assert "injected transport fault" in out           # source faults fired
    assert "reopens 3" in out, out                     # ...and all recovered
    assert "Tracker error" in out                      # device faults fired
    assert "re-acquired" in out or "faults" in out
    assert "Unrecoverable" not in out
    assert "final state TRACKING" in out, out
