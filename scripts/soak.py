"""Long-duration steady-state soak of the headless app (VERDICT r4 item 5).

Runs the REAL app entry (`python -m gstreamer_vit_tracker_tpu.app.main
--headless --no-pace`) as a subprocess over >=10k NV12 frames with
injected source transport faults and device faults, and monitors the
things an indefinite deployment cares about (the reference runs forever
on a live camera, /root/reference/src/main.rs:56-65):

* RSS of the app process, sampled every few seconds — asserts NO
  monotonic growth (median of the last quarter vs the first quarter
  after warmup);
* fps drift — the app's periodic "[STATE] FPS: ..." prints, last
  quarter vs first quarter;
* fault recovery — every injected fault must be recovered (source
  reopens counted by the app's teardown line; device faults by the
  session's "Tracker error"/re-acquired prints), and the run must not
  end in "Unrecoverable";
* compile churn — with the persistent compile cache enabled, counts new
  cache entries; steady state means the second half of the run compiles
  NOTHING new.

Prints one JSON line; exit code 0 iff all steady-state assertions hold.

Usage:
    python scripts/soak.py --frames 12000                 # real TPU
    python scripts/soak.py --frames 2000 --cpu --model corr-tiny
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def _cache_entries(cache_dir: str) -> int:
    try:
        return len(os.listdir(cache_dir))
    except OSError:
        return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12000)
    ap.add_argument("--model", default="vittrack-t")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--source-fault-every", type=int, default=997)
    ap.add_argument("--device-fault-every", type=int, default=1501)
    ap.add_argument("--corrupt-every", type=int, default=643)
    ap.add_argument("--sample-s", type=float, default=5.0,
                    help="RSS sampling period")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rss-growth-mb", type=float, default=150.0,
                    help="max allowed last-quarter vs first-quarter RSS "
                         "median growth")
    ap.add_argument("--fps-drift-frac", type=float, default=0.5,
                    help="max allowed relative fps drop, last vs first "
                         "quarter (the dev relay's throughput fluctuates "
                         "~2x between minutes — CLAUDE.md — so this bounds "
                         "collapse, not jitter)")
    ap.add_argument("--timeout-s", type=float, default=5400.0)
    args = ap.parse_args(argv)

    cache_dir = os.environ.get("GVT_COMPILE_CACHE",
                               "/tmp/gvt_jax_compile_cache")
    cmd = [sys.executable, "-m", "gstreamer_vit_tracker_tpu.app.main",
           "--headless", "--no-pace", "--source", "synthetic",
           "--format", "nv12", "--model", args.model,
           "--width", str(args.width), "--height", str(args.height),
           "--frames", str(args.frames),
           "--inject-source-fault", str(args.source_fault_every),
           "--inject-device-fault", str(args.device_fault_every),
           "--inject-corrupt", str(args.corrupt_every)]
    if args.cpu:
        cmd.append("--cpu")

    t0 = time.monotonic()
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, bufsize=1)

    rss_samples: list = []          # (t, mb)
    cache_samples: list = []        # (t, entries)
    done = threading.Event()

    def sampler():
        while not done.wait(args.sample_s):
            t = time.monotonic() - t0
            mb = _rss_mb(proc.pid)
            if mb > 0:
                rss_samples.append((t, mb))
            cache_samples.append((t, _cache_entries(cache_dir)))

    threading.Thread(target=sampler, daemon=True).start()

    fps_prints: list = []           # (t, fps)
    tracker_errors = 0
    reacquired = 0
    unrecoverable = False
    tail: list = []
    summary_line = ""
    fps_re = re.compile(r"\[([A-Z ]+)\] FPS: (\d+)")

    killer = threading.Timer(args.timeout_s, proc.kill)
    killer.start()
    try:
        for line in proc.stdout:
            line = line.rstrip("\n")
            tail.append(line)
            del tail[:-30]
            m = fps_re.search(line)
            if m:
                fps_prints.append((time.monotonic() - t0, float(m.group(2))))
            if "Tracker error" in line:
                tracker_errors += 1
            if "re-acquired" in line:
                reacquired += 1
            if "Unrecoverable" in line:
                unrecoverable = True
            if line.startswith("Done:"):
                summary_line = line
    finally:
        rc = proc.wait()
        killer.cancel()
        done.set()
    wall = time.monotonic() - t0

    def quarter(samples, which):
        vals = [v for t, v in samples]
        n = len(vals)
        if n < 8:
            return None
        q = max(2, n // 4)
        chunk = sorted(vals[q:2 * q] if which == "first" else vals[-q:])
        return chunk[len(chunk) // 2]        # median; 'first' skips warmup

    rss_first = quarter(rss_samples, "first")
    rss_last = quarter(rss_samples, "last")
    fps_first = quarter(fps_prints, "first")
    fps_last = quarter(fps_prints, "last")
    # Compile churn: new cache entries appearing in the SECOND half.
    cache_mid = cache_samples[len(cache_samples) // 2][1] if cache_samples else 0
    cache_end = cache_samples[-1][1] if cache_samples else 0

    m = re.search(r"Done: (\d+) frames .*faults (\d+) \(reopens (\d+)",
                  summary_line)
    frames_done = int(m.group(1)) if m else 0
    app_faults = int(m.group(2)) if m else -1
    reopens = int(m.group(3)) if m else -1

    checks = {
        "completed": rc == 0 and frames_done >= args.frames,
        "no_unrecoverable": not unrecoverable,
        "source_faults_recovered": reopens >= args.frames
        // args.source_fault_every if args.source_fault_every else True,
        "device_faults_recovered": (tracker_errors == 0
                                    or reacquired >= 1),
        "rss_steady": (rss_first is not None and rss_last is not None
                       and rss_last - rss_first <= args.rss_growth_mb),
        "fps_steady": (fps_first is not None and fps_last is not None
                       and fps_last >= (1.0 - args.fps_drift_frac)
                       * fps_first),
        "no_late_compiles": cache_end - cache_mid == 0,
    }
    result = {
        "metric": "soak_frames", "value": frames_done, "unit": "frames",
        "wall_s": round(wall, 1),
        "fps_overall": round(frames_done / max(wall, 1e-9), 1),
        "rss_first_mb": rss_first, "rss_last_mb": rss_last,
        "fps_first": fps_first, "fps_last": fps_last,
        "app_faults": app_faults, "source_reopens": reopens,
        "session_tracker_errors": tracker_errors,
        "reacquired": reacquired,
        "new_cache_entries_2nd_half": cache_end - cache_mid,
        "checks": checks,
        "ok": all(checks.values()),
    }
    print(json.dumps(result))
    if not result["ok"]:
        print("SOAK FAILED; last output lines:", file=sys.stderr)
        for line in tail[-12:]:
            print("  " + line, file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
