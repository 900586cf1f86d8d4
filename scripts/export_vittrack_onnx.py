"""Export a trained checkpoint as a cv2.TrackerVit-compatible ONNX graph.

    python scripts/export_vittrack_onnx.py --checkpoint \\
        assets/weights_vittrack_t_synthetic.npz --out vittrack_ours.onnx

The exported file has the OpenCV-Zoo VitTrack IO contract (two inputs
"template"/"search", outputs "output1/2/3" = conf/size/offset maps), so
OpenCV 5's cv2.TrackerVit loads and drives it directly:

    p = cv2.TrackerVit_Params(); p.net = "vittrack_ours.onnx"
    tracker = cv2.TrackerVit_create(p)

This is the reverse of scripts/import_vittrack_onnx.py and the
cross-implementation parity proof (tests/test_export_onnx.py): OpenCV's
own crop/normalize/decode pipeline tracking with our weights matches our
tracker.  NOTE: cv2's TrackerVit crops are sized for the zoo model
(template 128, search 256) — export presets with other input sizes run
under cv2.dnn but not under cv2.TrackerVit.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", default="vittrack_export.onnx")
    ap.add_argument("--target", default="standard",
                    choices=("standard", "cv2-5.0"),
                    help="'cv2-5.0' bakes in the inverse of OpenCV 5.0 "
                         "TrackerVit's measured blob quirk (sign-flipped "
                         "ch1/2, per-channel slopes ~1.46-1.49 — see "
                         "models/export_onnx.py::CV2_50_BLOB_SLOPE) so "
                         "cv2's own pipeline feeds the net the trained "
                         "distribution — use it for files driven by "
                         "cv2.TrackerVit")
    ap.add_argument("--skip-cv2-check", action="store_true",
                    help="skip the export-time self-check that measures "
                         "the INSTALLED cv2's blob convention with spy "
                         "graphs and aborts if it differs from the baked "
                         "compensation (runs only for --target cv2-5.0 "
                         "when cv2 is importable)")
    args = ap.parse_args(argv)

    if args.target == "cv2-5.0" and not args.skip_cv2_check:
        try:
            import cv2  # noqa: F401
            have_cv2 = True
        except ImportError:
            have_cv2 = False
            print("cv2 not importable: skipping the blob-convention "
                  "self-check (the baked compensation was measured "
                  "against OpenCV 5.0.0)")
        if have_cv2:
            from gstreamer_vit_tracker_tpu.compat import \
                verify_cv2_convention

            got = verify_cv2_convention()   # raises on mismatch
            print(f"cv2 blob-convention self-check OK "
                  f"(slopes {[round(s, 5) for s in got['slope']]}, "
                  f"crossings {[round(c, 4) for c in got['crossing']]}, "
                  f"hann peak {got['hann_peak']:.6f})")

    import jax

    jax.config.update("jax_platforms", "cpu")   # pure host-side conversion

    from gstreamer_vit_tracker_tpu.config import ModelConfig
    from gstreamer_vit_tracker_tpu.models import export_onnx, vittrack, weights

    cfg = ModelConfig(dtype="float32")
    params = weights.load_npz(
        args.checkpoint, vittrack.init_params(jax.random.PRNGKey(0), cfg))
    export_onnx.export_vittrack(params, cfg, args.out,
                                input_transform=args.target)
    print(f"exported {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"inputs template/search, outputs output1/2/3 = conf/size/offset)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
