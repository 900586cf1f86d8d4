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


def _block_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                  wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                  *, num_heads: int):
    x = x_ref[0]                                   # (S, D) compute dtype
    s_len, d = x.shape
    dh = d // num_heads
    scale = dh ** -0.5
    f32 = jnp.float32

    # --- attention branch ------------------------------------------------
    h = _ln_f32(x.astype(f32), ln1s_ref[0].astype(f32),
                ln1b_ref[0].astype(f32), x.dtype)
    qkv = (jax.lax.dot_general(h, wqkv_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
           + bqkv_ref[0].astype(f32)).astype(x.dtype)      # (S, 3D)

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
    proj = (jax.lax.dot_general(attn, wproj_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
            + bproj_ref[0].astype(f32)).astype(x.dtype)
    x1 = x + proj

    # --- MLP branch ------------------------------------------------------
    h2 = _ln_f32(x1.astype(f32), ln2s_ref[0].astype(f32),
                 ln2b_ref[0].astype(f32), x.dtype)
    g = (jax.lax.dot_general(h2, w1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
         + b1_ref[0].astype(f32)).astype(x.dtype)
    g = jax.nn.gelu(g)
    out = (jax.lax.dot_general(g, w2_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
           + b2_ref[0].astype(f32)).astype(x.dtype)
    o_ref[0] = x1 + out


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
