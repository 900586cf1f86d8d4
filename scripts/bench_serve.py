"""Service-level throughput bench: N loopback clients vs the tracking
service (serve/).

Measures the END-TO-END serving stack — wire protocol, per-connection
handler threads, the linger-window batcher, and the batched TPU step —
not the raw device step (bench.py --streams measures that ceiling).  On
this 1-core dev box the number is HOST-bound (frame serialisation + JSON
+ socket copies on a single core), so treat it as a floor for the service
overhead story, not a device throughput claim.  On the axon-relayed TPU
it is additionally RTT-bound: every batched tick makes one synchronous
~30-40 ms host fetch through the relay (measured p50 client latency ~=
one relay round-trip), which local TPU hardware would not pay.

Frames are pre-generated before the timed region (synthetic datagen runs
at ~50 frames/s on one core and would otherwise dominate).

Usage:
    python scripts/bench_serve.py [--streams 8] [--frames 120] [--cpu]
        [--model corr-tiny] [--format nv12] [--width 320 --height 256]

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--model", default="corr-tiny")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--format", default="nv12",
                    choices=["nv12", "yuy2", "rgb"])
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--batch-window-ms", type=float, default=2.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from gstreamer_vit_tracker_tpu.utils import compile_cache

        compile_cache.enable()

    from gstreamer_vit_tracker_tpu.app.main import (PRESETS,
                                                    _default_checkpoint)
    from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
    from gstreamer_vit_tracker_tpu.models import vittrack
    from gstreamer_vit_tracker_tpu.models import weights as weights_mod
    from gstreamer_vit_tracker_tpu.serve import (SlotEngine, TrackClient,
                                                 TrackServer)

    cfg = PRESETS[args.model]
    params = vittrack.init_params(jax.random.PRNGKey(0), cfg)
    ckpt = args.checkpoint or _default_checkpoint(args.model)
    if ckpt:
        params = weights_mod.load_npz(ckpt, params)

    engine = SlotEngine(params, cfg, slots=args.streams,
                        frame_format=args.format)
    server = TrackServer(engine, args.height, args.width, port=0,
                         batch_window_ms=args.batch_window_ms)
    server.start()

    print(f"pre-generating {args.streams}x{args.frames + 1} "
          f"{args.format} {args.width}x{args.height} frames...",
          file=sys.stderr)
    seqs = []
    for s in range(args.streams):
        src = SyntheticSource(args.width, args.height, obj_size=48,
                              seed=10 + s, speed=2.0, fmt=args.format)
        seqs.append(([src.frame(i) for i in range(args.frames + 1)],
                     src.bbox_at(0)))

    # Warm the compiled programs (init + step) outside the timed region.
    warm = TrackClient(server.host, server.port)
    warm.init(seqs[0][0][0], seqs[0][1])
    warm.update(seqs[0][0][1])
    warm.release()
    warm.close()

    lat_ms = [[] for _ in range(args.streams)]

    def run(k):
        frames, bbox0 = seqs[k]
        with TrackClient(server.host, server.port) as c:
            c.init(frames[0], bbox0)
            for i in range(1, args.frames + 1):
                t0 = time.perf_counter()
                c.update(frames[i])
                lat_ms[k].append(1000.0 * (time.perf_counter() - t0))
            c.release()

    threads = [threading.Thread(target=run, args=(k,))
               for k in range(args.streams)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    with TrackClient(server.host, server.port) as c:
        stats = c.stats()
    server.stop()

    total = args.streams * args.frames
    lat = np.concatenate([np.asarray(l) for l in lat_ms])
    out = {
        "metric": "served_stream_fps_aggregate",
        "value": round(total / wall, 1),
        "unit": "fps",
        "streams": args.streams,
        "frames_per_stream": args.frames,
        "format": f"{args.format} {args.width}x{args.height}",
        "model": args.model,
        "backend": jax.default_backend(),
        "ticks": stats["ticks"],
        "mean_tick_batch": round(total / max(1, stats["ticks"] - 1), 2),
        "client_lat_p50_ms": round(float(np.percentile(lat, 50)), 2),
        "client_lat_p99_ms": round(float(np.percentile(lat, 99)), 2),
        "host_bound_note": "end-to-end service stack incl. socket+JSON on "
                           "this box's single core; device ceiling is "
                           "bench.py --streams",
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
