"""Back-to-back A/B of the derived grouped head on the headline scan.

Device throughput on the relay-attached dev TPU fluctuates ~2x between
minutes (CLAUDE.md), so the tower-head and grouped-head variants run
interleaved in ONE session with rep-count differencing.

Usage: python scripts/ab_grouped_head.py [--reps 100]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gstreamer_vit_tracker_tpu.utils import compile_cache

    compile_cache.enable()

    import jax.numpy as jnp

    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.models import vittrack
    from gstreamer_vit_tracker_tpu.tracker import core, scan

    cfg = ModelConfig()
    params = vittrack.init_params(jax.random.PRNGKey(0), cfg)
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "assets",
                        "weights_vittrack_t_synthetic.npz")
    if os.path.exists(ckpt):
        from gstreamer_vit_tracker_tpu.models import weights as wmod

        params = wmod.load_npz(ckpt, params)
    grouped = vittrack.with_grouped_head(params)

    rng = np.random.default_rng(0)
    h, w, pool = 1080, 1920, 16
    ys = jnp.asarray(rng.integers(0, 256, (pool, h, w), dtype=np.uint8))
    uvs = jnp.asarray(rng.integers(0, 256, (pool, h // 2, w // 2, 2),
                                   dtype=np.uint8))
    bbox0 = jnp.asarray([900.0, 500.0, 120.0, 90.0])
    print(f"backend={jax.default_backend()} reps={args.reps}/{args.reps*5}")

    def runner(p):
        def run(reps):
            st = core.init_jit(p, (ys[0], uvs[0]), bbox0, cfg,
                               frame_format="nv12")
            t0 = time.perf_counter()
            _, sc = scan.update_scan_pool(p, st, (ys, uvs), reps, cfg,
                                          frame_format="nv12")
            np.asarray(sc)
            return time.perf_counter() - t0
        return run

    lo, hi = args.reps, args.reps * 5
    run_t, run_g = runner(params), runner(grouped)
    for f in (run_t, run_g):          # compile + warm all four programs
        f(lo), f(hi)
    # Interleaved sampling: tower/grouped alternate so a throughput drift
    # mid-measurement biases both equally.
    ts, gs = [], []
    for _ in range(3):
        ts.append((run_t(lo), run_t(hi)))
        gs.append((run_g(lo), run_g(hi)))
    t_ms = 1000 * (min(b for _, b in ts) - min(a for a, _ in ts)) / (hi - lo)
    g_ms = 1000 * (min(b for _, b in gs) - min(a for a, _ in gs)) / (hi - lo)
    print(f"tower head:   {t_ms:.4f} ms/step  ({1000.0 / t_ms:.0f} fps)")
    print(f"grouped head: {g_ms:.4f} ms/step  ({1000.0 / g_ms:.0f} fps)")
    print(f"delta: {t_ms - g_ms:+.4f} ms/step")
    return 0


if __name__ == "__main__":
    sys.exit(main())
