"""Fully-fused ViT encoder block as ONE Pallas TPU kernel.

The tracking step is encode-bound: after the decode rework the ViT's 12
blocks cost ~0.116 ms of the 0.127 ms step (scripts/profile_scan.py).  At
tracker shapes (S=320 tokens, D=192) every sub-op of a block — two
layernorms, the qkv/proj/mlp matmuls, three per-head attentions — is tiny,
so the XLA-op-per-op formulation pays kernel-launch overhead and HBM
round-trips for activations ~10 times per block.  Here one ``pallas_call``
per block keeps x, qkv, the score matrices, and the MLP hidden activation
in VMEM end-to-end; only the block input/output and the weights (streamed
once) touch HBM.

VMEM budget per program at the flagship shape (bf16): x/h/attn (320, 192)
~0.12 MB each, qkv (320, 576) 0.36 MB, per-head scores (320, 320) f32
0.4 MB, MLP hidden (320, 768) 0.5 MB, weights ~0.9 MB — ~3 MB total,
comfortably under the ~16 MB VMEM.

Numerics mirror models/vit.py::_block exactly (layernorm + softmax in f32,
bf16 elsewhere); parity is pinned by tests/test_vit_block.py.  Training
works through a ``custom_vjp`` whose backward differentiates the XLA
reference (the repo convention for Pallas kernels — forward fused, backward
recomputed), so the fused path is also usable under ``jax.grad``.

The reference app runs this entire computation inside the opaque RKNN NPU
blob (/root/reference/src/main.rs:25; SURVEY.md §2.9) — kernel-level
fusion of the encoder is exactly the piece the NPU compiler owned there.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

__all__ = ["block", "block_reference"]

_LN_EPS = 1e-6


def _ln_f32(xf: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
            out_dtype) -> jnp.ndarray:
    """Pre-LN in f32 (same math as models/vit.py::layer_norm)."""
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    return (y * scale + bias).astype(out_dtype)


def _block_math(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, ln2s, ln2b,
                w1, b1, w2, b2, num_heads: int):
    """One pre-LN transformer block on loaded VMEM arrays.  x: (S, D)."""
    s_len, d = x.shape
    dh = d // num_heads
    scale = dh ** -0.5
    f32 = jnp.float32

    # --- attention branch ------------------------------------------------
    h = _ln_f32(x.astype(f32), ln1s.astype(f32), ln1b.astype(f32), x.dtype)
    qkv = (jax.lax.dot_general(h, wqkv, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
           + bqkv.astype(f32)).astype(x.dtype)             # (S, 3D)

    heads = []
    for hd in range(num_heads):                    # static unroll (3 heads)
        q = qkv[:, hd * dh:(hd + 1) * dh].astype(f32) * scale
        k = qkv[:, d + hd * dh:d + (hd + 1) * dh].astype(f32)
        v = qkv[:, 2 * d + hd * dh:2 * d + (hd + 1) * dh].astype(f32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)   # (S, S)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        heads.append(o / jnp.sum(p, axis=-1, keepdims=True))  # (S, dh)

    attn = jnp.concatenate(heads, axis=1).astype(x.dtype)     # (S, D)
    proj = (jax.lax.dot_general(attn, wproj, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
            + bproj.astype(f32)).astype(x.dtype)
    x1 = x + proj

    # --- MLP branch ------------------------------------------------------
    h2 = _ln_f32(x1.astype(f32), ln2s.astype(f32), ln2b.astype(f32), x.dtype)
    g = (jax.lax.dot_general(h2, w1, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
         + b1.astype(f32)).astype(x.dtype)
    g = jax.nn.gelu(g)
    out = (jax.lax.dot_general(g, w2, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
           + b2.astype(f32)).astype(x.dtype)
    return x1 + out


def _block_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                  wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                  *, num_heads: int):
    o_ref[0] = _block_math(
        x_ref[0], ln1s_ref[0], ln1b_ref[0], wqkv_ref[...], bqkv_ref[0],
        wproj_ref[...], bproj_ref[0], ln2s_ref[0], ln2b_ref[0],
        w1_ref[...], b1_ref[0], w2_ref[...], b2_ref[0], num_heads)


def _encoder_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                    wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, o_ref, act_ref,
                    *, num_heads: int):
    """Whole-encoder kernel: grid = (batch, depth), depth innermost.

    Mosaic streams each depth step's weight slice into VMEM (pipelined
    against compute by the grid machinery); the activation lives in a VMEM
    scratch that persists across the sequential grid steps, so between
    blocks nothing touches HBM.  The output block index only depends on
    the batch coordinate, so o_ref stays VMEM-resident until the batch
    element is done — the final depth step's write is what lands in HBM.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        act_ref[...] = x_ref[0]

    out = _block_math(
        act_ref[...], ln1s_ref[0, 0], ln1b_ref[0, 0], wqkv_ref[0],
        bqkv_ref[0, 0], wproj_ref[0], bproj_ref[0, 0], ln2s_ref[0, 0],
        ln2b_ref[0, 0], w1_ref[0], b1_ref[0, 0], w2_ref[0], b2_ref[0, 0],
        num_heads)
    act_ref[...] = out
    o_ref[0] = out


def _row(a: jnp.ndarray) -> jnp.ndarray:
    return a.reshape(1, -1)


def _fused_forward(x: jnp.ndarray, p: Params, num_heads: int,
                   interpret: bool) -> jnp.ndarray:
    """x: (B, S, D) -> (B, S, D), one grid program per batch element."""
    b, s_len, d = x.shape
    hidden = p["mlp1"]["kernel"].shape[1]
    dt = x.dtype

    def w(name):           # weights in the compute dtype (cast at use)
        return p[name]["kernel"].astype(dt)

    def bias(name):
        return _row(p[name]["bias"].astype(dt))

    def const(shape):      # whole-array block, same for every program
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    specs = [
        pl.BlockSpec((1, s_len, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        const((1, d)), const((1, d)),                      # ln1 scale/bias
        const((d, 3 * d)), const((1, 3 * d)),              # qkv
        const((d, d)), const((1, d)),                      # proj
        const((1, d)), const((1, d)),                      # ln2 scale/bias
        const((d, hidden)), const((1, hidden)),            # mlp1
        const((hidden, d)), const((1, d)),                 # mlp2
    ]
    return pl.pallas_call(
        functools.partial(_block_kernel, num_heads=num_heads),
        grid=(b,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, s_len, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_len, d), dt),
        interpret=interpret,
    )(x,
      _row(p["ln1"]["scale"].astype(dt)), _row(p["ln1"]["bias"].astype(dt)),
      w("qkv"), bias("qkv"), w("proj"), bias("proj"),
      _row(p["ln2"]["scale"].astype(dt)), _row(p["ln2"]["bias"].astype(dt)),
      w("mlp1"), bias("mlp1"), w("mlp2"), bias("mlp2"))


def _encoder_forward(x: jnp.ndarray, blocks, num_heads: int,
                     interpret: bool) -> jnp.ndarray:
    """All encoder blocks in ONE pallas_call.  x: (B, S, D)."""
    b, s_len, d = x.shape
    depth = len(blocks)
    hidden = blocks[0]["mlp1"]["kernel"].shape[1]
    dt = x.dtype

    def stack(fn):
        return jnp.stack([fn(blk) for blk in blocks])

    def w(name):
        return stack(lambda blk: blk[name]["kernel"].astype(dt))

    def bias(name):
        return stack(lambda blk: _row(blk[name]["bias"].astype(dt)))

    def ln(name, field):
        return stack(lambda blk: _row(blk[name][field].astype(dt)))

    def per_block(shape):       # one block's slice of a stacked weight
        return pl.BlockSpec((1,) + shape, lambda bi, i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    specs = [
        pl.BlockSpec((1, s_len, d), lambda bi, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        per_block((1, d)), per_block((1, d)),              # ln1 scale/bias
        per_block((d, 3 * d)), per_block((1, 3 * d)),      # qkv
        per_block((d, d)), per_block((1, d)),              # proj
        per_block((1, d)), per_block((1, d)),              # ln2 scale/bias
        per_block((d, hidden)), per_block((1, hidden)),    # mlp1
        per_block((hidden, d)), per_block((1, d)),         # mlp2
    ]
    return pl.pallas_call(
        functools.partial(_encoder_kernel, num_heads=num_heads),
        grid=(b, depth),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, s_len, d), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_len, d), dt),
        scratch_shapes=[pltpu.VMEM((s_len, d), dt)],
        interpret=interpret,
    )(x,
      ln("ln1", "scale"), ln("ln1", "bias"), w("qkv"), bias("qkv"),
      w("proj"), bias("proj"), ln("ln2", "scale"), ln("ln2", "bias"),
      w("mlp1"), bias("mlp1"), w("mlp2"), bias("mlp2"))


def encoder_reference(x: jnp.ndarray, blocks, num_heads: int) -> jnp.ndarray:
    """XLA twin of the fused encoder (the per-block reference, chained)."""
    for p in blocks:
        x = block_reference(x, p, num_heads)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def encoder(x: jnp.ndarray, blocks, num_heads: int) -> jnp.ndarray:
    """All ViT blocks as one fused Pallas kernel (grid over depth, weights
    streamed per step, activation carried in VMEM).  Trainable: the
    backward differentiates the XLA reference chain."""
    interpret = jax.default_backend() != "tpu"
    return _encoder_forward(x, tuple(blocks), num_heads, interpret)


def _encoder_fwd(x, blocks, num_heads):
    return encoder(x, blocks, num_heads), (x, blocks)


def _encoder_bwd(num_heads, res, g):
    x, blocks = res
    _, vjp = jax.vjp(
        lambda xx, bb: encoder_reference(xx, bb, num_heads), x, list(blocks))
    return vjp(g)


encoder.defvjp(_encoder_fwd, _encoder_bwd)


def block_reference(x: jnp.ndarray, p: Params, num_heads: int) -> jnp.ndarray:
    """XLA twin of the fused kernel (= models/vit.py::_block with the plain
    attention path); used for CPU execution and as the backward function."""
    from ..models import vit as vit_mod

    return vit_mod._block(x, p, num_heads, use_pallas=False, fused=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def block(x: jnp.ndarray, p: Params, num_heads: int) -> jnp.ndarray:
    """Fused ViT block: Pallas on TPU, interpret mode elsewhere (tests)."""
    interpret = jax.default_backend() != "tpu"
    return _fused_forward(x, p, num_heads, interpret)


def _block_fwd(x, p, num_heads):
    return block(x, p, num_heads), (x, p)


def _block_bwd(num_heads, res, g):
    x, p = res
    _, vjp = jax.vjp(lambda xx, pp: block_reference(xx, pp, num_heads), x, p)
    return vjp(g)


block.defvjp(_block_fwd, _block_bwd)
