"""Convert a VitTrack ONNX checkpoint to this framework's npz format.

Migration path for users of the reference application, whose model is
OpenCV Zoo's ``object_tracking_vittrack_2023sep`` ONNX artifact
(/root/reference/src/main.rs:25 — the .rknn blob it loads is compiled from
that file).  Usage:

    python scripts/import_vittrack_onnx.py \
        --onnx object_tracking_vittrack_2023sep.onnx \
        --out weights_vittrack.npz [--preset small|flagship]

If your export uses different tensor names, the strict-mode error lists
exactly which model parameters went unfilled and which checkpoint tensors
had no mapping; pass --no-strict to load the intersection.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--onnx", required=True, help="ONNX checkpoint path")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--preset", default="vittrack-t",
                    choices=["vittrack-t", "small"])
    ap.add_argument("--no-strict", action="store_true",
                    help="load whatever maps instead of failing on gaps")
    args = ap.parse_args()

    import jax

    # Host-side weight conversion: no accelerator needed (and no TPU
    # contention with a serving process).  Must run before first backend
    # use — env vars alone cannot override a pinned platform.
    jax.config.update("jax_platforms", "cpu")

    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.models import (import_onnx, vittrack,
                                                  weights)

    if args.preset == "vittrack-t":
        cfg = ModelConfig()
    else:
        cfg = ModelConfig(template_size=64, search_size=128, patch_size=16,
                          embed_dim=96, depth=4, num_heads=2,
                          dtype="float32")
    like = vittrack.init_params(jax.random.PRNGKey(0), cfg)
    params = import_onnx.load_onnx(args.onnx, like,
                                   strict=not args.no_strict)
    weights.save_npz(args.out, params)
    n = vittrack.count_params(params)
    print(f"imported {n:,} params -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
