"""Static per-frame FLOP accounting for the tracking update (MFU).

Counts the matmul/conv FLOPs (2*M*N*K per GEMM — the "model FLOPs"
convention) of one tracked frame as the executed program performs them:

* fused preprocess — the banded resample GEMMs of ops/preprocess.py
  (row matrix @ plane @ column matrix per plane, chroma at half res);
* patch embed — search tokens only (template tokens are encoded at init
  and carried in TrackState; SURVEY.md §2.9);
* encoder blocks — qkv / scores / values / proj / mlp over the joint
  template+search token sequence;
* heads — the 4-conv grouped serving head (models/heads.py) or the
  3-tower training head; the grouped head's block-diagonal layers
  execute dense, so they are counted dense (that is the deliberate
  trade: ~160 MFLOP of zero-weight math for ~16 us less launch overhead
  per frame at flagship shapes).

Elementwise work (LayerNorm, GELU, softmax, BT.601 epilogue, hanning
decode) is excluded — it is fused into the GEMMs by XLA and contributes
~9% of XLA's own cost-analysis total at flagship shapes
(tests/test_flops.py pins the envelope).  Decode itself is O(fs^2) — nil.

MFU denominator: TPU v5e peak is 197 TFLOP/s bf16 (394 int8).
"""

from __future__ import annotations

from typing import Dict

V5E_BF16_PEAK_TFLOPS = 197.0


def _banded(frame_h: int, frame_w: int, band) -> tuple:
    if band is None:
        return frame_h, frame_w
    return min(band, frame_h), min(band, frame_w)


def preprocess_flops(cfg, frame_h: int, frame_w: int,
                     frame_format: str = "nv12") -> float:
    """FLOPs of one fused crop/resize/convert (the search crop of an
    update step).  ops/preprocess.py: two resample GEMMs per plane;
    NV12/YUY2 chroma planes run at half resolution."""
    o = cfg.search_size
    bh, bw = _banded(frame_h, frame_w, cfg.preprocess_band)
    if frame_format == "nv12":
        # Y: (o,bh)@(bh,bw) + (o,bw)@(bw,o); U,V at (bh/2, bw/2).
        return 3.0 * o * bh * bw + 4.0 * o * o * bw
    if frame_format == "yuy2":
        # Y full res; U,V at (bh, bw/2) with full-res row matrix.
        return 4.0 * o * bh * bw + 4.0 * o * o * bw
    if frame_format == "rgb":
        # einsum over 3 channels both passes.
        return 6.0 * o * bh * bw + 6.0 * o * o * bw
    raise ValueError(f"unknown frame format {frame_format!r}")


def encoder_flops(cfg) -> float:
    """Patch embed (search tokens) + all transformer blocks over the
    joint template+search sequence."""
    d = cfg.embed_dim
    p = cfg.patch_size
    tz = (cfg.template_size // p) ** 2
    tx = (cfg.search_size // p) ** 2
    n = tz + tx
    embed = 2.0 * tx * (p * p * 3) * d
    per_block = (2.0 * n * d * 3 * d        # qkv
                 + 4.0 * n * n * d          # scores + values
                 + 2.0 * n * d * d          # proj
                 + 4.0 * cfg.mlp_ratio * n * d * d)   # mlp1 + mlp2
    return embed + cfg.depth * per_block


def head_flops(cfg, grouped: bool = True) -> float:
    """Conv head over the (fs, fs, D) search feature map.

    ``grouped=True`` counts the 4-conv serving head (block-diagonal
    layers dense, models/heads.py::conv_head_grouped); ``False`` the
    3-tower training head (what batched/multi paths run)."""
    d = cfg.embed_dim
    tx = (cfg.search_size // cfg.patch_size) ** 2
    w = [d, d // 2, d // 4, d // 8]          # per-tower channel ladder
    if grouped:
        f = 2.0 * tx * 9 * w[0] * 3 * w[1]           # concat layer
        f += 2.0 * tx * 9 * (3 * w[1]) * (3 * w[2])  # block-diag, dense
        f += 2.0 * tx * 9 * (3 * w[2]) * (3 * w[3])
        f += 2.0 * tx * (3 * w[3]) * 5               # 1x1 -> score1+off2+sz2
        return f
    f = 3 * 2.0 * tx * 9 * w[0] * w[1]
    f += 3 * 2.0 * tx * 9 * w[1] * w[2]
    f += 3 * 2.0 * tx * 9 * w[2] * w[3]
    f += 2.0 * tx * w[3] * 5
    return f


def update_gflops(cfg, frame_h: int, frame_w: int,
                  frame_format: str = "nv12",
                  grouped_head: bool = True) -> float:
    """Model GFLOPs of ONE tracked frame (preprocess + embed + encoder
    + head), as executed."""
    total = (preprocess_flops(cfg, frame_h, frame_w, frame_format)
             + encoder_flops(cfg)
             + head_flops(cfg, grouped=grouped_head))
    return total / 1e9


def mfu_fields(fps: float, gflop_per_frame: float,
               prefix: str = "") -> Dict[str, float]:
    """The three bench-JSON fields VERDICT r4 item 4 mandates."""
    tflops = fps * gflop_per_frame / 1e3
    return {
        prefix + "gflop_per_frame": round(gflop_per_frame, 3),
        prefix + "achieved_tflops": round(tflops, 2),
        prefix + "mfu_vs_v5e_bf16": round(tflops / V5E_BF16_PEAK_TFLOPS, 4),
    }
