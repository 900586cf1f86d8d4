"""Profile the 16-stream batched step (BASELINE config 4) on the live TPU.

Isolates where the per-stream cost goes — batched NV12 preprocess, ViT
encode, heads/decode — with rep-count differencing (two scanned runs at
different rep counts; the slope is pure device time, free of the relay's
~40 ms fetch overhead; see docs/ARCHITECTURE.md perf notes).

Usage:  python scripts/profile_streams.py [--streams 16] [--band 1152]
"""

from __future__ import annotations

import argparse
import dataclasses
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
    ap.add_argument("--band", type=int, default=0,
                    help="override preprocess_band (0 = config default)")
    ap.add_argument("--reps", type=int, default=64)
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
    from gstreamer_vit_tracker_tpu.ops import preprocess as pp
    from gstreamer_vit_tracker_tpu.tracker import core, multi

    cfg = ModelConfig()
    if args.band:
        cfg = dataclasses.replace(cfg, preprocess_band=args.band)
    params = vittrack.init_params(jax.random.PRNGKey(0), cfg)

    s = args.streams
    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.integers(0, 256, (s, h, w), dtype=np.uint8))
    uvs = jnp.asarray(rng.integers(0, 256, (s, h // 2, w // 2, 2),
                                   dtype=np.uint8))
    bbox0 = jnp.asarray([900.0, 500.0, 120.0, 90.0])
    bbs = jnp.tile(bbox0[None, None], (s, 1, 1))

    def timed_scan(step, carry_init, label, reps):
        """step: carry -> carry. Returns device ms/rep via differencing."""

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(carry, n):
            def body(c, _):
                return step(c), 0
            c, _ = jax.lax.scan(body, carry, None, length=n)
            return c

        def wall(n):
            c = run(carry_init, n)
            leaves = [x for x in jax.tree.leaves(c)
                      if hasattr(x, "dtype")]
            np.asarray(leaves[0]).ravel()[:1]
            t0 = time.perf_counter()
            c = run(carry_init, n)
            np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]
            return time.perf_counter() - t0

        n1, n2 = reps, reps * 2
        w1, w2 = wall(n1), wall(n2)
        ms = 1000.0 * (w2 - w1) / (n2 - n1)
        print(f"{label:34s} {ms:8.3f} ms/step   "
              f"({ms / s * 1000:7.1f} us/stream)")
        return ms

    # Full batched step.
    st = multi.init_streams(params, (ys, uvs), bbs, cfg, "nv12")
    active = jnp.ones((s, 1), bool)

    def full_step(carry):
        st = carry
        st, _bx, _sc = multi.update_streams(params, st, (ys, uvs), active,
                                            cfg, "nv12")
        return st

    total = timed_scan(full_step, st, "full 16-stream step", args.reps)

    # Preprocess only: batched search-window crop from each stream's frame.
    # Must use the BATCHED config (band off, tracker/multi.py::_batched_cfg)
    # so the stage matches what the full step above actually runs —
    # profiling the banded vmap-gather path here would mis-attribute
    # ~0.27 ms/step.
    from gstreamer_vit_tracker_tpu.tracker.multi import _batched_cfg

    bcfg = _batched_cfg(cfg)

    def prep_step(carry):
        boxes = carry

        def one(y, uv, bb):
            win = pp.crop_window(bb, bcfg.search_factor)
            x = core._prep_nv12((y, uv), win, bcfg.search_size, bcfg)
            return x.astype(jnp.float32).mean()

        m = jax.vmap(one)(ys, uvs, boxes[:, 0])
        return boxes + m.reshape(s, 1, 1) * 1e-9

    prep = timed_scan(prep_step, bbs, "preprocess (batched NV12 crop)",
                      args.reps)

    # ViT forward only on pre-made crops (batch = s).
    x_img = jnp.zeros((s, cfg.search_size, cfg.search_size, 3), jnp.bfloat16)
    z_tok = st.z_tok.reshape((s,) + st.z_tok.shape[2:])

    def vit_step(carry):
        x = carry
        maps = vittrack.forward(params, z_tok, x, cfg)
        return x + maps.score.mean().astype(x.dtype) * 1e-9

    vit = timed_scan(vit_step, x_img, "ViT encode+heads (batch 16)",
                     args.reps)

    print(f"\ntotal {total:.3f} = prep {prep:.3f} + vit {vit:.3f} "
          f"+ other {total - prep - vit:.3f} ms")

    # Cost analysis of the full step.
    lowered = jax.jit(
        lambda st: multi.update_streams(params, st, (ys, uvs), active, cfg,
                                        "nv12")).lower(st)
    ca = lowered.compile().cost_analysis()
    if ca:
        for k in ("flops", "bytes accessed", "optimal_seconds"):
            if k in ca:
                print(f"cost_analysis[{k}] = {ca[k]:.3e}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
