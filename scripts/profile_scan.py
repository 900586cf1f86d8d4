"""Profile the scanned serving programs on the real TPU.

Companion to scripts/profile_streams.py (which profiles the per-call
batched step).  This isolates, by rep-count differencing inside scanned
programs (immune to relay dispatch latency):

  1. the single-stream headline step (full update vs preprocess-only vs
     encode-only) — where does the step budget actually go;
  2. the 16-stream scanned step: pool-gather frame pick vs fixed frames
     vs the per-call jitted loop.

Usage:  python scripts/profile_scan.py [--streams 16] [--reps 25]

All variants run in ONE process with the persistent compile cache on, so
repeat invocations skip compiles (relay-friendly).
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
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--reps", type=int, default=25)
    ap.add_argument("--reps-hi", type=int, default=0,
                    help="high rep count for differencing (default 5x reps)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    reps_hi = args.reps_hi or args.reps * 5

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gstreamer_vit_tracker_tpu.utils import compile_cache

    compile_cache.enable()

    import jax.numpy as jnp

    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.models import vittrack
    from gstreamer_vit_tracker_tpu.ops import preprocess as pp
    from gstreamer_vit_tracker_tpu.tracker import core, multi, scan

    cfg = ModelConfig()
    params = vittrack.init_params(jax.random.PRNGKey(0), cfg)
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "assets", "weights_vittrack_t_synthetic.npz")
    if os.path.exists(ckpt):
        from gstreamer_vit_tracker_tpu.models import weights as wmod

        params = wmod.load_npz(ckpt, params)
    # Bench-condition params: derived 4-conv grouped head on the unbatched
    # serving path (bench.py applies the same; without it the profiled
    # step pays the 12-conv tower the bench does not).
    params = vittrack.with_grouped_head(params)

    rng = np.random.default_rng(0)
    h, w, s, pool = 1080, 1920, args.streams, 16
    ys = jnp.asarray(rng.integers(0, 256, (pool, h, w), dtype=np.uint8))
    uvs = jnp.asarray(rng.integers(0, 256, (pool, h // 2, w // 2, 2),
                                   dtype=np.uint8))
    bbox0 = jnp.asarray([900.0, 500.0, 120.0, 90.0])
    print(f"backend={jax.default_backend()} streams={s} "
          f"reps={args.reps}/{reps_hi}")

    def diff_ms(fn, lo, hi):
        """Marginal per-rep ms via rep differencing; fn(reps) -> wall s."""
        fn(lo)                     # compile + warm both programs
        fn(hi)
        a = min(fn(lo) for _ in range(2))
        b = min(fn(hi) for _ in range(2))
        return 1000.0 * (b - a) / (hi - lo)

    # ---- 1. headline step decomposition --------------------------------
    def timed_scan(body_maker):
        @functools.partial(jax.jit, static_argnames=("reps",),
                           donate_argnums=(1,))
        def prog(params, state, frames, reps):
            body = body_maker(params, frames)
            return jax.lax.scan(body, state, jnp.arange(reps))

        def run(reps):
            st = core.init_jit(params, (ys[0], uvs[0]), bbox0, cfg,
                               frame_format="nv12")
            stt, out = prog(params, st, (ys, uvs), reps)
            np.asarray(out)
            st = core.init_jit(params, (ys[0], uvs[0]), bbox0, cfg,
                               frame_format="nv12")
            t0 = time.perf_counter()
            stt, out = prog(params, st, (ys, uvs), reps)
            np.asarray(out)
            return time.perf_counter() - t0

        return run

    def full_body(params, frames):
        def body(st, i):
            fr = (frames[0][i % pool], frames[1][i % pool])
            st, _bx, sc = core.update(params, st, fr, cfg,
                                      frame_format="nv12")
            return st, sc
        return body

    def prep_body(params, frames):
        # preprocess only: crop window from carried bbox, fused NV12 crop.
        def body(st, i):
            fr = (frames[0][i % pool], frames[1][i % pool])
            win = pp.crop_window(st.bbox, cfg.search_factor)
            x_img = pp.preprocess_nv12(fr[0], fr[1], win, cfg.search_size,
                                       cfg.norm_mean, cfg.norm_std,
                                       dtype=jnp.bfloat16,
                                       band=cfg.preprocess_band)
            return st, x_img.mean(dtype=jnp.float32)
        return body

    def encode_body(params, frames):
        # preprocess + ViT encode + heads, but no decode / state rebuild.
        def body(st, i):
            fr = (frames[0][i % pool], frames[1][i % pool])
            win = pp.crop_window(st.bbox, cfg.search_factor)
            x_img = pp.preprocess_nv12(fr[0], fr[1], win, cfg.search_size,
                                       cfg.norm_mean, cfg.norm_std,
                                       dtype=jnp.bfloat16,
                                       band=cfg.preprocess_band)
            maps = vittrack.forward(params, st.z_tok[None], x_img[None], cfg)
            return st, maps.score.mean(dtype=jnp.float32)
        return body

    lo, hi = args.reps, reps_hi
    t_full = diff_ms(timed_scan(full_body), lo, hi)
    t_enc = diff_ms(timed_scan(encode_body), lo, hi)
    t_prep = diff_ms(timed_scan(prep_body), lo, hi)
    print(f"headline marginal ms/step: full={t_full:.4f} "
          f"prep+vit+heads={t_enc:.4f} prep={t_prep:.4f} "
          f"-> vit+heads={t_enc - t_prep:.4f} decode+state={t_full - t_enc:.4f}")

    # ---- 2. multi-stream scan variants ---------------------------------
    bbs = jnp.tile(bbox0[None, None], (s, 1, 1))
    active = jnp.ones((s, 1), bool)

    def run_scan_pool(reps):
        st = multi.init_streams_jit(params, (ys[:s], uvs[:s]), bbs, cfg, "nv12")
        stt, sc = scan.update_streams_scan_pool(params, st, (ys, uvs),
                                                active, reps, cfg, "nv12")
        np.asarray(sc)
        st = multi.init_streams_jit(params, (ys[:s], uvs[:s]), bbs, cfg, "nv12")
        t0 = time.perf_counter()
        stt, sc = scan.update_streams_scan_pool(params, st, (ys, uvs),
                                                active, reps, cfg, "nv12")
        np.asarray(sc)
        return time.perf_counter() - t0

    @functools.partial(jax.jit, static_argnames=("reps",),
                       donate_argnums=(1,))
    def scan_fixed(params, state, frames, active, reps):
        def body(st, i):
            st, _bx, sc = multi.update_streams(params, st, frames, active,
                                               cfg, "nv12")
            return st, sc
        return jax.lax.scan(body, state, jnp.arange(reps))

    def run_scan_fixed(reps):
        st = multi.init_streams_jit(params, (ys[:s], uvs[:s]), bbs, cfg, "nv12")
        stt, sc = scan_fixed(params, st, (ys[:s], uvs[:s]), active, reps)
        np.asarray(sc)
        st = multi.init_streams_jit(params, (ys[:s], uvs[:s]), bbs, cfg, "nv12")
        t0 = time.perf_counter()
        stt, sc = scan_fixed(params, st, (ys[:s], uvs[:s]), active, reps)
        np.asarray(sc)
        return time.perf_counter() - t0

    m_pool = diff_ms(run_scan_pool, lo, hi)
    m_fixed = diff_ms(run_scan_fixed, lo, hi)

    def run_loop(reps):
        st = multi.init_streams_jit(params, (ys[:s], uvs[:s]), bbs, cfg, "nv12")
        st, _bx, sc = multi.update_streams_jit(params, st, (ys[:s], uvs[:s]),
                                               active, cfg, "nv12")
        np.asarray(sc)
        t0 = time.perf_counter()
        for _ in range(reps):
            st, _bx, sc = multi.update_streams_jit(
                params, st, (ys[:s], uvs[:s]), active, cfg, "nv12")
        np.asarray(sc)
        return time.perf_counter() - t0

    run_loop(lo)
    l = min(run_loop(lo) for _ in range(2)) / lo * 1000.0
    print(f"{s}-stream ms/step: scan_pool_gather={m_pool:.3f} "
          f"scan_fixed={m_fixed:.3f} (gather adds {m_pool - m_fixed:.3f}) "
          f"python_loop={l:.3f} (incl. dispatch)")
    agg = s / m_pool * 1000.0
    print(f"{s}-stream aggregate (scan_pool): {agg:.0f} fps "
          f"({agg / s:.0f} per stream)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
