"""Whole-preprocess + patch-embed as ONE Pallas TPU kernel (b=1 serving).

The unbatched NV12 step spends ~25 us of its ~127 us on preprocess (~10)
plus patch-embed (~15, dominated by the 6-D patchify relayout XLA folds
into the embed matmul's operand write) — spread over ~6 small XLA kernels
at ~2 us fixed launch cost each (docs/ARCHITECTURE.md stage budget).  Both
stages are one linear chain over the banded frame, so this module runs the
entire path

    NV12 band -> (offset-shift) -> bilinear window resample (MXU matmuls
    against in-kernel iota-generated sampling matrices) -> BT.601 mix ->
    clip/normalize -> patchify -> embed matmul -> +bias +pos-embed

inside a single ``pallas_call``: the band is read from HBM once, every
intermediate lives in VMEM, and one kernel launch replaces the whole
launch train.  The sampling matrices are never materialised in HBM at all
(the XLA path writes/reads ~2.4 MB of them per frame).

Semantics mirror ``ops.preprocess.preprocess_nv12`` (offset-before-resample
so out-of-window padding decodes to black; chroma via pair-folded matrices,
generated here directly in folded form) followed by
``models.vit.embed_search`` — parity is pinned by
tests/test_fused_prep_embed.py.  Reference components subsumed:
nv12_convert.rs:46-169 and the vit_tracker crate's crop/resize/normalize +
patch embed (SURVEY.md §2.9).

Two in-kernel patchify formulations are kept because their Mosaic lowering
costs differ and only a device A/B can pick (CLAUDE.md: rank variants from
back-to-back diffs in one session):

* ``mode="transpose"`` — raster crop, one 5-D transpose to (N, K), one
  (N, K) @ (K, D) embed matmul (the XLA plain path's shape, minus HBM).
* ``mode="loop"`` — patch-major crop rows (free: the ROW sampling matrix is
  generated pre-permuted), channel-interleaved planes, then ``patch``
  accumulating (N, patch*3) @ (patch*3, D) matmuls — no transpose at all,
  at the cost of K=48-thin MXU passes.

REAL-TPU STATUS (measured 2026-08-18, jax 0.8 / libtpu v5e): **Mosaic
cannot lower either formulation.**  Three distinct limits were hit (first
two are fixed in this file, the third is structural):

1. no uint8->float cast — hop through int32 (free);
2. ``tpu.iota`` is integer-only — generate i32, cast to f32;
3. **no reshape may merge data into the lane (minor) dimension**:
   ``(256,256,3)->(256,768)`` and ``(16,16,16,16,3)->(256,768)`` both die
   with "unsupported shape cast".  Every patchify formulation needs
   exactly such a merge — the same cross-lane relayout XLA materialises
   on the plain path.  Rank-1/outer-product rewrites avoid it but move
   the embed off the MXU (measured dead end, see CLAUDE.md).

The kernel therefore raises on the real TPU backend (set
``GVT_FUSED_PREP_FORCE=1`` to re-probe a future toolchain) and remains
exercised in interpret mode by tests/test_fused_prep_embed.py as the
input-layout spec for a future hand-written Mosaic kernel.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .colorspace import BT601_COEFFS
from . import preprocess as pp

__all__ = ["nv12_search_tokens"]


def _hat(t: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    """Bilinear hat weight max(0, 1 - |t - j|) in f32."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(t - j))


def _kernel(scal_ref, y_ref, uv_ref, w_ref, pb_ref, out_ref, *,
            out_size: int, patch: int, mode: str, dt, norm):
    """Single-program kernel: the whole banded prep + embed chain.

    scal_ref (SMEM, (4,) f32): [start_y, start_x, scale, 0]
    y_ref   (bh, bw) uint8   — banded luma plane
    uv_ref  (bh//2, bw) uint8 — banded chroma rows, raw interleaved U,V
    w_ref   (patch*patch*3, D) dt — patch-embed kernel, k = (p, q, c)
    pb_ref  (N, D) dt        — pos_embed + bias, precombined
    out_ref (N, D) dt        — embedded search tokens
    """
    f32 = jnp.float32
    bh, bw = y_ref.shape
    g = out_size // patch
    n_tok = g * g
    sy, sx, sc = scal_ref[0], scal_ref[1], scal_ref[2]

    # --- sampling matrices, generated in VMEM from iota (never in HBM) ---
    def target(start, r_to_o=None):
        # output index r (rows of the matrix) -> source coordinate.
        def mat(rows, cols, half: bool):
            # Mosaic's tpu.iota is integer-only; generate i32 then cast.
            r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0).astype(f32)
            j = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1).astype(f32)
            o = r if r_to_o is None else r_to_o(r)
            t = start + (o + 0.5) * sc - 0.5
            if half:
                # pair-folded half-res matrix, built directly:
                # M'[o, i] = hat(t - 2i) + hat(t - 2i - 1).
                return (_hat(t, 2.0 * j) + _hat(t, 2.0 * j + 1.0)).astype(dt)
            return _hat(t, j).astype(dt)

        return mat

    row_mat = target(sy)
    col_mat = target(sx)
    if mode == "loop":
        # Patch-major output rows r = p*g + gh come from pixel row
        # y = gh*patch + p: permuting the GENERATED matrix rows is free.
        pm = lambda r: jnp.floor(r / g) + (r - jnp.floor(r / g) * g) * patch
        row_mat = target(sy, pm)

    ry = row_mat(out_size, bh, half=False)           # (S, bh)
    ry_uv = row_mat(out_size, bh // 2, half=True)    # (S, bh/2)
    cx = col_mat(out_size, bw, half=False)           # (S, bw)

    # Interleaved-chroma column matrices: U lives at even byte columns
    # s = 2c, V at odd s = 2c + 1; fold weights land on the byte column.
    r = jax.lax.broadcasted_iota(jnp.int32, (out_size, bw), 0).astype(f32)
    s = jax.lax.broadcasted_iota(jnp.int32, (out_size, bw), 1).astype(f32)
    t = sx + (r + 0.5) * sc - 0.5
    even = (s - 2.0 * jnp.floor(s / 2.0)) < 0.5
    fold = _hat(t, s) + _hat(t, s + 1.0)         # = M'[., s/2] at even s
    foldv = _hat(t, s - 1.0) + _hat(t, s)        # = M'[., (s-1)/2] at odd s
    cx_u = jnp.where(even, fold, 0.0).astype(dt)
    cx_v = jnp.where(even, 0.0, foldv).astype(dt)

    # --- offset-shift + resample (MXU) --------------------------------------
    # Mosaic has no uint8->float cast; hop through int32 (measured: free).
    yp = (y_ref[...].astype(jnp.int32).astype(f32) - 16.0).astype(dt)
    uvp = (uv_ref[...].astype(jnp.int32).astype(f32) - 128.0).astype(dt)

    def mm(a, b_t):          # a @ b_t.T with f32 accumulation
        return jax.lax.dot_general(a, b_t, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    tmp_y = jax.lax.dot_general(ry, yp, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32).astype(dt)
    yc = mm(tmp_y, cx)                               # (S, S) f32
    tmp_uv = jax.lax.dot_general(ry_uv, uvp, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32).astype(dt)
    uc = mm(tmp_uv, cx_u)                            # (S, S) f32
    vc = mm(tmp_uv, cx_v)

    # --- BT.601 mix + clip + normalize (VPU) ---------------------------------
    c = BT601_COEFFS
    yv = c["y"] * yc
    planes = (yv + c["rv"] * vc,
              yv + c["gu"] * uc + c["gv"] * vc,
              yv + c["bu"] * uc)
    mean, std = norm
    # Patchify stays f32: Mosaic only reshapes/expands 32-bit vectors
    # ("insertion of minor dim ... only supported for 32-bit types").
    planes = tuple(
        (jnp.clip(pl_, 0.0, 255.0) / 255.0 - mean[i]) / std[i]
        for i, pl_ in enumerate(planes))

    # --- patchify + embed ----------------------------------------------------
    if mode == "transpose":
        crop = jnp.stack(planes, axis=-1)            # (S, S, 3) f32
        x = crop.reshape(g, patch, g, patch, 3)
        x = x.transpose(0, 2, 1, 3, 4).reshape(n_tok, patch * patch * 3)
        tok = jax.lax.dot_general(x.astype(dt), w_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
    else:                                            # "loop"
        inter = jnp.stack(planes, axis=-1).reshape(out_size, out_size * 3)
        kp = patch * 3
        tok = jnp.zeros((n_tok, out_ref.shape[1]), f32)
        for p in range(patch):                       # static unroll
            a = inter[p * g:(p + 1) * g].reshape(n_tok, kp)
            tok = tok + jax.lax.dot_general(
                a.astype(dt), w_ref[p * kp:(p + 1) * kp],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
    out_ref[...] = (tok.astype(dt) + pb_ref[...]).astype(dt)


@functools.partial(jax.jit, static_argnames=("out_size", "patch", "band",
                                             "mode", "dtype_name", "norm"))
def _run(y_plane, uv_plane, cy, cx_, size, pe_kernel, pos_plus_bias,
         out_size: int, patch: int, band, mode: str, dtype_name: str,
         norm):
    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    h, w = y_plane.shape
    start_y = cy - 0.5 * size
    start_x = cx_ - 0.5 * size
    if band is not None and (h > band or w > band):
        bh, bw = min(band, h), min(band, w)
        row0, col0 = pp.band_origin(
            pp.CropWindow(cx=cx_, cy=cy, size=size), h, w, band)
        y_plane = jax.lax.dynamic_slice(y_plane, (row0, col0), (bh, bw))
        uv_plane = jax.lax.dynamic_slice(
            uv_plane, (row0 // 2, col0 // 2, 0), (bh // 2, bw // 2, 2))
        start_y = start_y - row0
        start_x = start_x - col0
        h, w = bh, bw
    uv_flat = uv_plane.reshape(h // 2, w)            # raw NV12 byte order
    scal = jnp.stack([start_y, start_x, size / out_size, 0.0]
                     ).astype(jnp.float32)
    n_tok = (out_size // patch) ** 2
    d = pe_kernel.shape[1]
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_kernel, out_size=out_size, patch=patch,
                          mode=mode, dt=dt, norm=norm),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tok, d), dt),
        interpret=interpret,
    )(scal, y_plane, uv_flat, pe_kernel.astype(dt), pos_plus_bias.astype(dt))


def nv12_search_tokens(params, y_plane: jnp.ndarray, uv_plane: jnp.ndarray,
                       window: "pp.CropWindow", cfg,
                       mode: str = "loop") -> jnp.ndarray:
    """Fused NV12 band -> embedded search tokens (N, D), incl. pos embed.

    Drop-in for ``embed_search(params, preprocess_nv12(...))`` on the
    unbatched serving path; inference-only (no custom_vjp — training uses
    the XLA chain).
    """
    if jax.default_backend() == "tpu" and not os.environ.get(
            "GVT_FUSED_PREP_FORCE"):
        raise NotImplementedError(
            "fused prep+embed cannot lower on real TPU: Mosaic rejects the "
            "patchify's merge-into-lane reshape (see module docstring). "
            "Use the plain XLA path, or GVT_FUSED_PREP_FORCE=1 to re-probe.")
    bb = params["backbone"] if "backbone" in params else params
    pe = bb["patch_embed"]
    pb = bb["pos_embed_x"] + pe["bias"][None, :]
    return _run(y_plane, uv_plane, window.cy, window.cx, window.size,
                pe["kernel"], pb, cfg.search_size, cfg.patch_size,
                cfg.preprocess_band, mode, cfg.dtype,
                (tuple(cfg.norm_mean), tuple(cfg.norm_std)))
