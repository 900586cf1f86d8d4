"""Cross-implementation trajectory agreement vs cv2.TrackerVit, with the
residual decomposed one pipeline stage at a time (VERDICT r3 item 1).

For each seed, OpenCV 5's own TrackerVit tracks our exported graph; then
a ladder of trackers — from the bit-exact replica down to our production
tracker — tracks the same frames, and each rung's mean IoU against cv2's
trajectory attributes one stage of the residual:

  replica        Cv2VitReplica, cv2.dnn forward      -> 1.000 (bit-exact)
  matched        OUR JAX forward, cv2-exact crop/decode/int-Rect feedback
                 (the matched-crop eval mode; residual = f32 arithmetic)
  float-window   + production float crop + MXU resample (residual adds
                 crop quantisation)
  float-feedback + float rect carried between frames (residual adds cv2's
                 integer-Rect state truncation)
  production     our tracker/core.py step (adds window freeze/re-detection
                 machinery; inert on these fully-visible scenarios)

    python scripts/agreement_cv2.py --frames 400 --seeds 5 9 13

Prints a per-rung table and one JSON line (docs/EXPORT.md quotes it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def iou(a, b):
    ix = max(0.0, min(a[0] + a[2], b[0] + b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1]))
    inter = ix * iy
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--seeds", type=int, nargs="+", default=[5, 9, 13])
    ap.add_argument("--checkpoint",
                    default="assets/weights_vittrack_t_synthetic.npz")
    ap.add_argument("--onnx", default="",
                    help="reuse an exported cv2-5.0 graph (default: "
                         "export fresh into a temp dir)")
    ap.add_argument("--rungs", nargs="+",
                    default=["replica", "matched", "float-window",
                             "float-feedback", "production"])
    args = ap.parse_args(argv)

    import cv2
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gstreamer_vit_tracker_tpu.compat import (Cv2VitReplica,
                                                  MatchedCropTracker)
    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
    from gstreamer_vit_tracker_tpu.models import export_onnx, vittrack, weights
    from gstreamer_vit_tracker_tpu.tracker import core

    cfg = ModelConfig(dtype="float32")
    params = weights.load_npz(
        args.checkpoint, vittrack.init_params(jax.random.PRNGKey(0), cfg))

    tmp = None
    onnx_path = args.onnx
    if not onnx_path:
        tmp = tempfile.TemporaryDirectory()
        onnx_path = os.path.join(tmp.name, "vittrack_cv2.onnx")
        export_onnx.export_vittrack(params, cfg, onnx_path,
                                    input_transform="cv2-5.0")

    upd = jax.jit(lambda p, s, f: core.update(p, s, f, cfg,
                                              use_pallas=False, fused=False))

    def make_rung(name):
        if name == "replica":
            return Cv2VitReplica(onnx_path)
        if name == "matched":
            return MatchedCropTracker(params, cfg)
        if name == "float-window":
            return MatchedCropTracker(params, cfg, window="float")
        if name == "float-feedback":
            return MatchedCropTracker(params, cfg, window="float",
                                      feedback="float")
        raise ValueError(name)

    results = {r: [] for r in args.rungs}
    n = args.frames
    for seed in args.seeds:
        src = SyntheticSource(640, 512, obj_size=48, seed=seed, speed=3.0)
        frames = [np.asarray(src.frame_rgb(i)) for i in range(n + 1)]
        bb0 = tuple(int(v) for v in src.bbox_at(0))

        t0 = time.time()
        p = cv2.TrackerVit_Params()
        p.net = onnx_path
        tr = cv2.TrackerVit_create(p)
        tr.init(frames[0], bb0)
        ref = [tr.update(f)[1] for f in frames[1:]]
        print(f"seed {seed}: cv2 reference done ({time.time() - t0:.0f}s)",
              flush=True)

        for name in args.rungs:
            t0 = time.time()
            if name == "production":
                st = core.init(params, jnp.asarray(frames[0]),
                               jnp.asarray(bb0, jnp.float32), cfg)
                ious = []
                for i in range(1, n + 1):
                    st, bb, _c = upd(params, st, jnp.asarray(frames[i]))
                    ious.append(iou(np.asarray(bb), ref[i - 1]))
            else:
                rung = make_rung(name)
                rung.init(frames[0], bb0)
                ious = [iou(rung.update(frames[i]), ref[i - 1])
                        for i in range(1, n + 1)]
            m = float(np.mean(ious))
            results[name].append({"seed": seed, "mean_iou": round(m, 4),
                                  "min_iou": round(float(np.min(ious)), 4)})
            print(f"  {name:15s} mean {m:.4f}  min {np.min(ious):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    print()
    agg = {}
    for name in args.rungs:
        rows = results[name]
        agg[name] = {
            "mean_iou": round(float(np.mean([r["mean_iou"] for r in rows])), 4),
            "min_iou": round(float(np.min([r["min_iou"] for r in rows])), 4),
        }
        print(f"{name:15s} mean {agg[name]['mean_iou']:.4f}  "
              f"min {agg[name]['min_iou']:.4f}")
    print(json.dumps({"frames": n, "seeds": args.seeds, "per_rung": agg,
                      "per_seed": results}))
    if tmp:
        tmp.cleanup()
    return 0


if __name__ == "__main__":
    sys.exit(main())
