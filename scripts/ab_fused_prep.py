"""A/B the one-kernel NV12 preprocess+patch-embed (ops/fused_prep_embed)
against the plain XLA chain, on the real TPU, in ONE process.

Measures (rep-count differencing inside scanned programs, immune to relay
dispatch noise — CLAUDE.md measurement rules):

  1. full headline step: plain vs fused_prep="loop" vs "transpose";
  2. the isolated prep+embed stage for the same three variants.

Usage:  python scripts/ab_fused_prep.py [--reps 50] [--cpu]
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
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--reps-hi", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    reps_hi = args.reps_hi or args.reps * 5

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from gstreamer_vit_tracker_tpu.utils import compile_cache

        compile_cache.enable()

    import jax.numpy as jnp

    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.models import vit, vittrack
    from gstreamer_vit_tracker_tpu.ops import fused_prep_embed as fpe
    from gstreamer_vit_tracker_tpu.ops import preprocess as pp
    from gstreamer_vit_tracker_tpu.tracker import core, scan

    cfg = ModelConfig()
    params = vittrack.init_params(jax.random.PRNGKey(0), cfg)
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "assets",
                        "weights_vittrack_t_synthetic.npz")
    if os.path.exists(ckpt):
        from gstreamer_vit_tracker_tpu.models import weights as wmod

        params = wmod.load_npz(ckpt, params)
    params = vittrack.with_grouped_head(params)   # bench-condition params

    rng = np.random.default_rng(0)
    h, w, pool = 1080, 1920, 16
    ys = jnp.asarray(rng.integers(0, 256, (pool, h, w), dtype=np.uint8))
    uvs = jnp.asarray(rng.integers(0, 256, (pool, h // 2, w // 2, 2),
                                   dtype=np.uint8))
    bbox0 = jnp.asarray([900.0, 500.0, 120.0, 90.0])
    print(f"backend={jax.default_backend()} reps={args.reps}/{reps_hi}")

    def diff_ms(fn, lo, hi):
        fn(lo)
        fn(hi)
        a = min(fn(lo) for _ in range(2))
        b = min(fn(hi) for _ in range(2))
        return 1000.0 * (b - a) / (hi - lo)

    # ---- 1. full step ---------------------------------------------------
    def run_full(fused_prep):
        def run(reps):
            st = core.init_jit(params, (ys[0], uvs[0]), bbox0, cfg,
                               frame_format="nv12")
            _, sc = scan.update_scan_pool(params, st, (ys, uvs), reps, cfg,
                                          "nv12", fused_prep=fused_prep)
            np.asarray(sc)
            st = core.init_jit(params, (ys[0], uvs[0]), bbox0, cfg,
                               frame_format="nv12")
            t0 = time.perf_counter()
            _, sc = scan.update_scan_pool(params, st, (ys, uvs), reps, cfg,
                                          "nv12", fused_prep=fused_prep)
            np.asarray(sc)
            return time.perf_counter() - t0
        return run

    # Attempt the Pallas variants even on real TPU (the module otherwise
    # raises: Mosaic can't lower the patchify — see fused_prep_embed
    # docstring); a FAIL line here is the re-probe record.
    os.environ.setdefault("GVT_FUSED_PREP_FORCE", "1")

    lo, hi = args.reps, reps_hi
    for fp in (False, "loop", "transpose"):
        try:
            t = diff_ms(run_full(fp), lo, hi)
            print(f"full step ms ({fp or 'plain'}): {t:.4f}")
        except Exception as e:
            print(f"full step ({fp or 'plain'}): FAIL "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:120]}")

    # ---- 2. isolated prep+embed stage ------------------------------------
    def stage_scan(body):
        @functools.partial(jax.jit, static_argnames=("reps",),
                           donate_argnums=(1,))
        def prog(params, state, frames, reps):
            return jax.lax.scan(body(params, frames), state,
                                jnp.arange(reps))

        def run(reps):
            st = core.init_jit(params, (ys[0], uvs[0]), bbox0, cfg,
                               frame_format="nv12")
            _, out = prog(params, st, (ys, uvs), reps)
            np.asarray(out)
            st = core.init_jit(params, (ys[0], uvs[0]), bbox0, cfg,
                               frame_format="nv12")
            t0 = time.perf_counter()
            _, out = prog(params, st, (ys, uvs), reps)
            np.asarray(out)
            return time.perf_counter() - t0
        return run

    def plain_body(params, frames):
        def body(st, i):
            fr = (frames[0][i % pool], frames[1][i % pool])
            win = pp.crop_window(st.bbox, cfg.search_factor)
            x_img = pp.preprocess_nv12(fr[0], fr[1], win, cfg.search_size,
                                       cfg.norm_mean, cfg.norm_std,
                                       dtype=jnp.bfloat16,
                                       band=cfg.preprocess_band)
            tok = vit.embed_search(params["backbone"], x_img[None], cfg)
            return st, tok.mean(dtype=jnp.float32)
        return body

    def fused_body(mode):
        def maker(params, frames):
            def body(st, i):
                fr = (frames[0][i % pool], frames[1][i % pool])
                win = pp.crop_window(st.bbox, cfg.search_factor)
                tok = fpe.nv12_search_tokens(params, fr[0], fr[1], win, cfg,
                                             mode=mode)
                return st, tok.mean(dtype=jnp.float32)
            return body
        return maker

    t = diff_ms(stage_scan(plain_body), lo, hi)
    print(f"prep+embed stage ms (plain): {t:.4f}")
    for mode in ("loop", "transpose"):
        try:
            t = diff_ms(stage_scan(fused_body(mode)), lo, hi)
            print(f"prep+embed stage ms ({mode}): {t:.4f}")
        except Exception as e:
            print(f"prep+embed stage ({mode}): FAIL "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:120]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
