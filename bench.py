"""Headline benchmark: tracked FPS per chip, 1080p NV12, single-object.

Measures the full per-frame tracking step — fused NV12 crop/resize/
normalise -> ViT (Pallas flash attention) -> heads -> hanning decode ->
bbox, with TrackState donated (HBM-resident) — on the flagship vittrack-t
model over HBM-resident 1080p NV12 frames (the north-star configuration in
BASELINE.json).  By default one invocation then runs compact versions of
EVERY other BASELINE config — 16-stream batch, 8-object online-update,
4K+HUD, 1080p RGB, YUY2 640x512, the serve-tier SlotEngine tick rate, and
per-frame host->device ingest — so the driver's single run records all
eight numbers (--no-ingest / --headline-only trim the run).

Steps are dispatched asynchronously back-to-back (the production serving
shape: a pipelined feed with bounded in-flight frames, mirroring the
reference's leaky-queue pipelining, pipeline_ir.rs:75-78) and timed over N
frames after a compile+warmup pass.  ``vs_baseline`` is value / 500 — the
reference repo publishes no numbers (BASELINE.md), so the north-star
target of 500 tracked FPS per v5e chip is the denominator; >= 1.0 means
target met.

Prints ONE JSON line:
  {"metric": "tracked_fps_per_chip_1080p_nv12", "value": ..., "unit":
   "fps", "vs_baseline": ..., ...extras}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--pool", type=int, default=16,
                    help="distinct HBM-resident frames cycled through")
    # Every BASELINE config runs BY DEFAULT (compact reps) so a single
    # driver invocation records all six numbers in one JSON line;
    # --headline-only restores the old single-config behaviour.
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the secondary configs (streams/objects/uhd/"
                         "rgb/yuy2); headline 1080p NV12 only")
    ap.add_argument("--streams", type=int, default=16,
                    help="N-stream batched throughput (config 4); 0 skips")
    ap.add_argument("--objects", type=int, default=8,
                    help="N-object single-frame throughput with online "
                         "template update (config 3); 0 skips")
    ap.add_argument("--no-ingest", dest="ingest", action="store_false",
                    default=True,
                    help="skip the ingest config (reported BY DEFAULT since "
                         "round 4: per-frame host->device 1080p NV12 "
                         "transfer feeding the tracked step, double-buffered "
                         "async device_put, plus raw h2d bandwidth — makes "
                         "the device-resident framing of the headline "
                         "machine-readable every round)")
    ap.add_argument("--ingest", dest="ingest", action="store_true",
                    help=argparse.SUPPRESS)   # pre-round-4 spelling
    ap.add_argument("--serve-slots", type=int, default=16,
                    help="slots for the serve-tier config (in-process "
                         "SlotEngine tick rate, BASELINE config 4's serving "
                         "analog); 0 skips")
    ap.add_argument("--loop-frames", type=int, default=100,
                    help="frames for the per-frame Python-loop latency "
                         "measurement (p50/p99)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend: validates the whole "
                         "bench harness without a TPU (numbers are NOT "
                         "comparable; the JSON carries backend=cpu)")
    ap.add_argument("--init-timeout", type=int, default=240,
                    help="seconds before declaring the TPU backend "
                         "unreachable (the dev relay can hang for an hour "
                         "after a crash; a bench that blocks forever is "
                         "worse than an error line the driver can record)")
    args = ap.parse_args(argv)

    # Fail fast if the TPU relay is down: backend init then hangs
    # indefinitely (observed: hours after a relay crash), which would
    # stall any driver that invokes bench.py.  A daemon watchdog thread
    # fires even while the main thread is stuck inside the backend's C
    # init call (network waits release the GIL); os._exit is the only
    # exit that works from there.
    import os
    import threading

    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(args.init_timeout):
            print(json.dumps({
                "metric": "tracked_fps_per_chip_1080p_nv12", "value": 0.0,
                "unit": "fps", "vs_baseline": 0.0,
                "error": f"TPU backend unreachable after "
                         f"{args.init_timeout}s (relay outage?)"}))
            sys.stdout.flush()
            os._exit(1)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        # No compile cache on CPU (XLA:CPU AOT caches host-specific code;
        # SIGILL risk when the cache dir moves between machines).
        jax.config.update("jax_platforms", "cpu")
    else:
        from gstreamer_vit_tracker_tpu.utils import compile_cache

        compile_cache.enable()   # compile each program once per machine
    jax.devices()            # force backend init under the watchdog
    init_done.set()

    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.models import vittrack
    from gstreamer_vit_tracker_tpu.tracker import core

    backend = jax.default_backend()
    cfg = ModelConfig()  # flagship conv-head vittrack-t, bf16
    params = vittrack.init_params(jax.random.PRNGKey(0), cfg)
    # Use the shipped trained flagship weights when available so crop
    # windows and decode behave like production (random weights predict
    # degenerate boxes -> worst-case full-frame windows).
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets",
                        "weights_vittrack_t_synthetic.npz")
    trained = False
    if os.path.exists(ckpt):
        from gstreamer_vit_tracker_tpu.models import weights as weights_mod

        params = weights_mod.load_npz(ckpt, params)
        trained = True
    # Derived 4-conv grouped head for the unbatched serving paths
    # (batched configs auto-fall back to the tower head).
    params = vittrack.with_grouped_head(params)

    h, w = 1080, 1920
    rng = np.random.default_rng(0)

    # Pool of HBM-resident NV12 frames (content varies so nothing folds).
    frames = []
    for i in range(args.pool):
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        uv = rng.integers(0, 256, (h // 2, w // 2, 2), dtype=np.uint8)
        frames.append((jnp.asarray(y), jnp.asarray(uv)))
    jax.block_until_ready(frames[-1])

    from gstreamer_vit_tracker_tpu.tracker import scan

    ys = jnp.stack([f[0] for f in frames])
    uvs = jnp.stack([f[1] for f in frames])
    bbox0 = jnp.asarray([900.0, 500.0, 120.0, 90.0])
    n = args.frames

    # --- Headline: on-device throughput.  The whole N-frame sequence runs
    # as ONE scanned XLA program over the HBM-resident frame pool; state
    # never leaves HBM, scores return in one fetch.  Timed runs are
    # repeated and the best taken: the dev TPU is reached through a relay
    # whose round-trip latency (and the shared device's throughput)
    # fluctuates between seconds — a single sample can read 2-3x slow.
    def timed_runs(fn, k=2):
        return min(fn() for _ in range(k))

    state = core.init_jit(params, frames[0], bbox0, cfg, frame_format="nv12")
    st2, scores = scan.update_scan_pool(params, state, (ys, uvs), n, cfg,
                                        frame_format="nv12")
    np.asarray(scores)   # compile + first run

    def run_headline():
        state = core.init_jit(params, frames[0], bbox0, cfg,
                              frame_format="nv12")
        t0 = time.perf_counter()
        _, scores = scan.update_scan_pool(params, state, (ys, uvs), n, cfg,
                                          frame_format="nv12")
        np.asarray(scores)   # real value fetch, not just block_until_ready
        return time.perf_counter() - t0

    wall = timed_runs(run_headline)
    fps = n / wall
    scan_step_ms = 1000.0 * wall / n   # steady-state MEAN step time (scan)

    # Model-FLOPs utilisation (VERDICT r4 item 4): static matmul/conv
    # count of one tracked frame (preprocess GEMMs + embed + 12 blocks +
    # grouped head — utils/flops.py, validated against XLA cost analysis
    # in tests/test_flops.py) against the v5e bf16 peak (197 TFLOP/s).
    # The model is shape-bound at D=192/320 tokens; the measured dead
    # ends (int8 W8A8, patch-major embed, Mosaic patchify) are recorded
    # in CLAUDE.md / docs/ARCHITECTURE.md.
    from gstreamer_vit_tracker_tpu.utils import flops as flops_mod

    headline_gf = flops_mod.update_gflops(cfg, h, w, "nv12",
                                          grouped_head=True)

    # --- Secondary: per-frame Python dispatch loop (interactive shape).
    # (a) async chained dispatch, one packed fetch at the end (throughput);
    # (b) fully synchronous per-frame latency — dispatch + the packed
    #     5-float fetch the interactive app performs every frame — from
    #     which a REAL p50/p99 is computed.  On a relay-attached dev TPU
    #     the fetch round trip dominates (b); both are reported honestly.
    state = core.init_jit(params, frames[0], bbox0, cfg, frame_format="nv12")
    state, packed = core.update_packed_jit(params, state, frames[0], cfg,
                                           frame_format="nv12")
    np.asarray(packed)
    n_loop = max(1, min(n, args.loop_frames))   # >=1: percentile of an
    # empty latency array would throw away the whole run's JSON line
    t0 = time.perf_counter()
    for i in range(n_loop):
        state, packed = core.update_packed_jit(
            params, state, frames[i % args.pool], cfg, frame_format="nv12")
    np.asarray(packed)
    loop_fps = n_loop / (time.perf_counter() - t0)

    lat_ms = []
    for i in range(n_loop):
        t1 = time.perf_counter()
        state, packed = core.update_packed_jit(
            params, state, frames[i % args.pool], cfg, frame_format="nv12")
        np.asarray(packed)          # per-frame synchronous value fetch
        lat_ms.append(1000.0 * (time.perf_counter() - t1))
    lat = np.asarray(lat_ms)

    result = {
        "metric": "tracked_fps_per_chip_1080p_nv12",
        "value": round(fps, 1),
        "unit": "fps",
        # The reference publishes no numbers (BASELINE.md); denominator is
        # the 500-fps-per-chip north-star TARGET, not a measured baseline.
        "vs_baseline": round(fps / 500.0, 3),
        "baseline_is": "500 fps north-star target",
        "scan_step_ms_mean": round(scan_step_ms, 3),
        "python_loop_fps": round(loop_fps, 1),
        "sync_p50_ms": round(float(np.percentile(lat, 50)), 3),
        "sync_p99_ms": round(float(np.percentile(lat, 99)), 3),
        # Relay-health marker: the dev TPU is reached through a network
        # relay that degrades under sustained load (CLAUDE.md); a healthy
        # window sustains ~1400 fps on the per-frame Python dispatch loop.
        # When this run's loop fps is well below that, EVERY number in this
        # line is a lower bound measured through a degraded window.
        "window_degraded": bool(backend != "cpu" and loop_fps < 1200.0),
        **flops_mod.mfu_fields(fps, headline_gf),
        "backend": backend,
        "model": "vittrack-t(192d x12L, bf16, conv head)"
                 + (" trained" if trained else " random-init"),
    }

    # Optional configs run after the headline; a transient device failure in
    # one of them (the dev relay is known to crash under sustained load,
    # CLAUDE.md) must not lose the whole run — record the error per config
    # and still print the JSON line.
    def _optional(name, fn):
        try:
            fn()
        except Exception as e:                      # noqa: BLE001
            result[name + "_error"] = f"{type(e).__name__}: {e}"[:200]

    def _config_streams():
        # Config 4: S independent 1080p streams per batched step, run as
        # ONE scanned on-device program over the frame pool (the bulk-
        # serving shape; the per-call Python dispatch path is measured by
        # python_loop_fps above).
        from gstreamer_vit_tracker_tpu.tracker import multi

        s = args.streams
        ys0 = jnp.stack([frames[i % args.pool][0] for i in range(s)])
        uvs0 = jnp.stack([frames[i % args.pool][1] for i in range(s)])
        bbs = jnp.tile(bbox0[None, None], (s, 1, 1))
        active = jnp.ones((s, 1), bool)
        pool_ys, pool_uvs = ys, uvs   # headline's stacks, same content
        # Compact reps (the default run covers six configs in one
        # relay-safe invocation): 300 steps x 16 streams = 4800 tracked
        # frames, ~0.5 s of device time — comfortably past the >=100 ms
        # floor below which relay dispatch noise dominates (CLAUDE.md).
        reps = min(n, 300)

        st = multi.init_streams_jit(params, (ys0, uvs0), bbs, cfg, "nv12")
        st, sc = scan.update_streams_scan_pool(params, st,
                                               (pool_ys, pool_uvs), active,
                                               reps, cfg, "nv12")
        np.asarray(sc)

        def run_streams():
            st = multi.init_streams_jit(params, (ys0, uvs0), bbs, cfg, "nv12")
            t0 = time.perf_counter()
            _, sc = scan.update_streams_scan_pool(params, st,
                                                  (pool_ys, pool_uvs),
                                                  active, reps, cfg, "nv12")
            np.asarray(sc)
            return time.perf_counter() - t0

        swall = timed_runs(run_streams)
        result["stream_fps_total"] = round(reps * s / swall, 1)
        result["streams"] = s
        # Batched paths run the 3-tower head (multi.py), not the grouped one.
        result.update(flops_mod.mfu_fields(
            reps * s / swall,
            flops_mod.update_gflops(cfg, h, w, "nv12", grouped_head=False),
            prefix="stream_"))

    def _config_objects():
        # Config 3: N targets in one shared 1080p frame, online template
        # update enabled, one scanned batched step per frame.
        import dataclasses

        from gstreamer_vit_tracker_tpu.tracker import multi

        mcfg = dataclasses.replace(cfg, template_update_enabled=True)
        m = args.objects
        bbs = jnp.asarray(np.tile([900.0, 500.0, 120.0, 90.0], (m, 1))
                          + np.arange(m)[:, None] * np.asarray([40.0, 20.0, 0, 0]))
        active = jnp.ones((m,), bool)
        pool_ys, pool_uvs = ys, uvs   # headline's stacks, same content
        reps = min(n, 300)   # compact: see streams note

        st = multi.init_objects_jit(params, frames[0], bbs, mcfg, "nv12")
        st, sc = scan.update_objects_scan_pool(params, st,
                                               (pool_ys, pool_uvs), active,
                                               reps, mcfg, "nv12")
        np.asarray(sc)

        def run_objects():
            st = multi.init_objects_jit(params, frames[0], bbs, mcfg, "nv12")
            t0 = time.perf_counter()
            _, sc = scan.update_objects_scan_pool(params, st,
                                                  (pool_ys, pool_uvs),
                                                  active, reps, mcfg, "nv12")
            np.asarray(sc)
            return time.perf_counter() - t0

        result["object_tracks_per_s"] = round(
            reps * m / timed_runs(run_objects), 1)
        result["objects"] = m

    def _config_uhd():
        # Config 5: 4K NV12 input; EVERY tracked frame gets the full
        # on-device HUD (state/fps/trk text, live score digits, bbox rect +
        # crosshair) composited onto its luma plane inside the scanned
        # loop — per-frame draw cost is inside the measured region, exactly
        # like the reference's per-frame draw pass (pipeline.rs:125-174).
        from gstreamer_vit_tracker_tpu.ops import font as font_mod

        h4, w4 = 2160, 3840
        pool4 = 4
        ys4 = jnp.asarray(rng.integers(0, 256, (pool4, h4, w4),
                                       dtype=np.uint8))
        uvs4 = jnp.asarray(rng.integers(0, 256, (pool4, h4 // 2, w4 // 2, 2),
                                        dtype=np.uint8))
        hud_text = (font_mod.encode_text("TRACKING", 12),
                    font_mod.encode_text("FPS: 60.0", 16),
                    font_mod.encode_text("trk: 0.3ms", 16))
        reps = min(n, 200)

        st = core.init_jit(params, (ys4[0], uvs4[0]), bbox0, cfg,
                           frame_format="nv12")
        st, disp, sc = scan.update_scan_hud_pool(params, st, (ys4, uvs4),
                                                 hud_text, reps, cfg)
        np.asarray(sc)
        np.asarray(disp[:2, :2])   # warm the slice program too

        def run_uhd():
            st = core.init_jit(params, (ys4[0], uvs4[0]), bbox0, cfg,
                               frame_format="nv12")
            t0 = time.perf_counter()
            _, disp, sc = scan.update_scan_hud_pool(params, st, (ys4, uvs4),
                                                    hud_text, reps, cfg)
            np.asarray(sc)
            np.asarray(disp[:2, :2])   # the display buffer is real
            return time.perf_counter() - t0

        uhd_fps = reps / timed_runs(run_uhd)
        result["uhd_fps"] = round(uhd_fps, 1)
        result["uhd_hud"] = "per-frame on-device composite"
        # HUD compositing work is NOT in the FLOP count (elementwise
        # masking) — uhd MFU is a slight undercount by construction.
        result.update(flops_mod.mfu_fields(
            uhd_fps, flops_mod.update_gflops(cfg, h4, w4, "nv12",
                                             grouped_head=True),
            prefix="uhd_"))

    def _config_rgb():
        # BASELINE config 1: single-object tracking over 1080p RGB frames
        # (the file-source path); same scanned-pool protocol as the
        # headline, through preprocess_rgb.
        pool_f = jnp.asarray(rng.integers(0, 256, (args.pool, h, w, 3),
                                          dtype=np.uint8))

        st = core.init_jit(params, pool_f[0], bbox0, cfg, frame_format="rgb")
        st, sc = scan.update_scan_pool(params, st, pool_f, n, cfg,
                                       frame_format="rgb")
        np.asarray(sc)

        def run_rgb():
            st = core.init_jit(params, pool_f[0], bbox0, cfg,
                               frame_format="rgb")
            t0 = time.perf_counter()
            _, sc = scan.update_scan_pool(params, st, pool_f, n, cfg,
                                          frame_format="rgb")
            np.asarray(sc)
            return time.perf_counter() - t0

        result["rgb_1080p_fps"] = round(n / timed_runs(run_rgb), 1)

    def _config_yuy2():
        # Reference-active capture mode: YUY2 640x512@60
        # (pipeline_ir.rs:27-41).  Same scanned-pool protocol as the
        # headline, on the packed 4:2:2 buffers with the column-folded
        # chroma preprocess.
        hy, wy = 512, 640
        pool_f = jnp.asarray(rng.integers(0, 256, (args.pool, hy, wy * 2),
                                          dtype=np.uint8))
        bb = jnp.asarray([400.0, 250.0, 80.0, 60.0])

        st = core.init_jit(params, pool_f[0], bb, cfg, frame_format="yuy2")
        st, sc = scan.update_scan_pool(params, st, pool_f, n, cfg,
                                       frame_format="yuy2")
        np.asarray(sc)

        def run_yuy2():
            st = core.init_jit(params, pool_f[0], bb, cfg,
                               frame_format="yuy2")
            t0 = time.perf_counter()
            _, sc = scan.update_scan_pool(params, st, pool_f, n, cfg,
                                          frame_format="yuy2")
            np.asarray(sc)
            return time.perf_counter() - t0

        result["yuy2_640x512_fps"] = round(n / timed_runs(run_yuy2), 1)

    def _config_ingest():
        # Ingest-included config (BASELINE config 5's end-to-end story):
        # every frame travels host->device before its tracked step, double-
        # buffered so the next frame's async transfer overlaps the current
        # step — the TPU analog of the reference's dmabuf capture feed
        # (io-mode=4, pipeline_ir.rs:23-26).  1080p NV12 = 3.1 MB/frame.
        np_frames = []
        for i in range(args.pool):
            np_frames.append(
                (rng.integers(0, 256, (h, w), dtype=np.uint8),
                 rng.integers(0, 256, (h // 2, w // 2, 2), dtype=np.uint8)))

        state = core.init_jit(params, frames[0], bbox0, cfg,
                              frame_format="nv12")
        dev = jax.device_put(np_frames[0])
        state, packed = core.update_packed_jit(params, state, dev, cfg,
                                               frame_format="nv12")
        np.asarray(packed)
        n_in = min(n, 200)
        t0 = time.perf_counter()
        dev = jax.device_put(np_frames[0])
        for i in range(n_in):
            nxt = jax.device_put(np_frames[(i + 1) % args.pool])
            state, packed = core.update_packed_jit(params, state, dev, cfg,
                                                   frame_format="nv12")
            dev = nxt
        np.asarray(packed)
        iwall = time.perf_counter() - t0
        result["ingest_fps"] = round(n_in / iwall, 1)
        result["ingest_mb_s"] = round(n_in * (h * w * 1.5) / iwall / 1e6, 1)

        # Raw host->device bandwidth (no tracking) for attribution: if
        # ingest_mb_s ~= h2d_mb_s the path is transfer-bound (on the dev
        # relay the tunnel tops out around ~20 MB/s; a locally attached
        # TPU host moves NV12 frames orders of magnitude faster).  Synced
        # with a REAL value fetch — block_until_ready under-waits on the
        # relay (CLAUDE.md) — of a warmed 1-element slice program.
        probe = jax.device_put(np_frames[0])
        np.asarray(probe[0][:1, :1])            # warm the slice fetch
        t0 = time.perf_counter()
        last = None
        for i in range(n_in):
            last = jax.device_put(np_frames[i % args.pool])
        np.asarray(last[0][:1, :1])
        rwall = time.perf_counter() - t0
        result["h2d_mb_s"] = round(n_in * (h * w * 1.5) / rwall / 1e6, 1)

    def _config_serve():
        # Serve-tier config (VERDICT r3 item 3): in-process SlotEngine tick
        # rate at S slots, 1080p NV12, every slot live.  This is the
        # SERVICE shape — each tick is one donated batched step followed by
        # a synchronous packed (S, 5) fetch that waiting clients block on,
        # so unlike the scanned stream config the per-tick host round trip
        # is part of the product (on the relay-attached dev TPU that RTT
        # ~= sync_p50_ms dominates; a locally attached host sees the step
        # cost).  Frames are device-resident (ingest is measured
        # separately by the ingest config).
        from gstreamer_vit_tracker_tpu.serve import SlotEngine

        s = args.serve_slots
        eng = SlotEngine(params, cfg, slots=s, frame_format="nv12",
                         snapshot_every=0)
        for i in range(s):
            eng.init_slot(eng.alloc(),
                          frames[i % args.pool], bbox0)
        ys_s = jnp.stack([frames[i % args.pool][0] for i in range(s)])
        uvs_s = jnp.stack([frames[(i + 1) % args.pool][1] for i in range(s)])
        jax.block_until_ready((ys_s, uvs_s))
        active = np.ones(s, bool)
        eng.step((ys_s, uvs_s), active)     # compile + warm
        ticks = max(10, min(50, n // 10))

        def run_serve():
            t0 = time.perf_counter()
            for _ in range(ticks):
                eng.step((ys_s, uvs_s), active)
            return time.perf_counter() - t0

        swall = timed_runs(run_serve)
        result["serve_fps"] = round(ticks * s / swall, 1)
        result["serve_ticks_per_s"] = round(ticks / swall, 1)
        result["serve_slots"] = s

        # Pipelined variant (round 5, VERDICT r4 item 1): dispatch tick
        # N+1 before fetching tick N's packed (S, 5) array — a pool of
        # ``depth`` fetcher threads keeps up to ``depth`` result fetches
        # in flight, overlapping the per-tick host RTT with device work
        # (TrackServer runs the same structure via pipeline_depth).
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        depth = 2
        ex = ThreadPoolExecutor(depth)

        def run_serve_pipelined():
            futs = deque()
            t0 = time.perf_counter()
            for _ in range(ticks):
                packed_dev = eng.step_async((ys_s, uvs_s), active)
                futs.append(ex.submit(np.asarray, packed_dev))
                if len(futs) > depth:
                    futs.popleft().result()
            while futs:
                futs.popleft().result()
            return time.perf_counter() - t0

        run_serve_pipelined()   # warm the thread pool / fetch path
        pwall = timed_runs(run_serve_pipelined)
        ex.shutdown()
        result["serve_fps_pipelined"] = round(ticks * s / pwall, 1)
        result["serve_ticks_per_s_pipelined"] = round(ticks / pwall, 1)
        result["serve_pipeline_depth"] = depth

    if not args.headline_only:
        if args.streams:
            _optional("stream", _config_streams)
        if args.objects:
            _optional("object", _config_objects)
        _optional("uhd", _config_uhd)
        _optional("rgb", _config_rgb)
        _optional("yuy2", _config_yuy2)
        if args.serve_slots:
            _optional("serve", _config_serve)
    if args.ingest:
        _optional("ingest", _config_ingest)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
