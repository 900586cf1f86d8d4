"""Evaluate tracking quality: IoU vs ground truth on synthetic videos.

    python scripts/eval_tracking.py --preset small --checkpoint w.npz
    python scripts/eval_tracking.py --preset corr-tiny       # training-free

Reports per-sequence mean/min IoU and mean confidence — the framework's
quantitative substitute for the reference's validate-by-eye workflow
(SURVEY.md §4).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.utils import compile_cache

compile_cache.enable()
from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
from gstreamer_vit_tracker_tpu.models import vittrack, weights
from gstreamer_vit_tracker_tpu.tracker import core

PRESETS = {
    "corr-tiny": ModelConfig(template_size=64, search_size=128, patch_size=8,
                             embed_dim=64, depth=0, num_heads=2,
                             head_mode="corr", dtype="float32"),
    "small": ModelConfig(template_size=64, search_size=128, patch_size=16,
                         embed_dim=96, depth=4, num_heads=2, dtype="float32"),
    "vittrack-t": ModelConfig(),
}


def iou(a, b):
    ix = max(0.0, min(a[0] + a[2], b[0] + b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1]))
    inter = ix * iy
    return inter / (a[2] * a[3] + b[2] * b[3] - inter)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="corr-tiny", choices=sorted(PRESETS))
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--seqs", type=int, default=5)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--speed", type=float, default=3.0)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=256)
    args = ap.parse_args(argv)

    cfg = PRESETS[args.preset]
    params = vittrack.init_params(jax.random.PRNGKey(0), cfg)
    if args.checkpoint:
        params = weights.load_npz(args.checkpoint, params)
        print(f"loaded {args.checkpoint}")

    upd = jax.jit(lambda p, s, f: core.update(p, s, f, cfg))
    all_means = []
    for seq in range(args.seqs):
        src = SyntheticSource(args.width, args.height,
                              obj_size=40 + 8 * seq, seed=seq,
                              speed=args.speed)
        st = core.init(params, jnp.asarray(src.frame_rgb(0)),
                       jnp.asarray(src.bbox_at(0)), cfg)
        ious, confs = [], []
        for i in range(1, args.frames + 1):
            st, bbox, conf = upd(params, st, jnp.asarray(src.frame_rgb(i)))
            ious.append(iou(np.asarray(bbox), np.asarray(src.bbox_at(i))))
            confs.append(float(conf))
        ious = np.asarray(ious)
        all_means.append(ious.mean())
        print(f"seq {seq} (obj {40 + 8 * seq}px): mean IoU {ious.mean():.3f} "
              f"min {ious.min():.3f} last {ious[-1]:.3f} "
              f"conf {np.mean(confs):.2f}")
    print(f"\noverall mean IoU: {np.mean(all_means):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
