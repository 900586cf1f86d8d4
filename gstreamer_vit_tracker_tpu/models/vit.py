"""ViT encoder backbone — pure functional JAX (params as pytrees).

Re-implements the backbone of OpenCV Zoo's ``object_tracking_vittrack``
model that the reference runs as an opaque RKNN blob on the Rockchip NPU
(/root/reference/src/main.rs:25, SURVEY.md §2.9).  The architecture is the
OSTrack-style one-stream tracker: template and search crops are
patch-embedded (with separate learned position embeddings), concatenated
into one token sequence, and encoded jointly by a standard pre-LN ViT.

Design notes (TPU-first):
* patch embedding is a reshape + single MXU matmul (no conv op needed for
  stride == kernel);
* attention auto-dispatches between the Pallas flash-attention kernel and
  plain XLA softmax by measured crossover (ops/attention.py — XLA wins at
  tracker sequence lengths, the kernel past ~512 padded tokens);
* everything is shape-static and jit/vmap/pjit-friendly; params are plain
  nested dicts so sharding rules can be applied with tree paths.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention import multihead_attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def init_vit_params(key: jax.Array, cfg: ModelConfig) -> Params:
    d = cfg.embed_dim
    p = cfg.patch_size
    keys = jax.random.split(key, 4 + cfg.depth)
    params: Params = {
        "patch_embed": {
            "kernel": _trunc_normal(keys[0], (p * p * 3, d)),
            "bias": jnp.zeros((d,)),
        },
        "pos_embed_z": _trunc_normal(keys[1], (cfg.num_template_tokens, d)),
        "pos_embed_x": _trunc_normal(keys[2], (cfg.num_search_tokens, d)),
        "norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "blocks": [],
    }
    for i in range(cfg.depth):
        bk = jax.random.split(keys[4 + i], 4)
        hidden = int(d * cfg.mlp_ratio)
        params["blocks"].append({
            "ln1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "ln2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "qkv": {"kernel": _trunc_normal(bk[0], (d, 3 * d)),
                    "bias": jnp.zeros((3 * d,))},
            "proj": {"kernel": _trunc_normal(bk[1], (d, d)),
                     "bias": jnp.zeros((d,))},
            "mlp1": {"kernel": _trunc_normal(bk[2], (d, hidden)),
                     "bias": jnp.zeros((hidden,))},
            "mlp2": {"kernel": _trunc_normal(bk[3], (hidden, d)),
                     "bias": jnp.zeros((d,))},
        })
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def cast_params(p: Params, dtype) -> Params:
    """Cast float params to the compute dtype at use-site (master weights
    stay f32 in the optimiser).  Without this, ``bf16_x @ f32_w`` silently
    promotes every matmul back to f32 — the classic JAX mixed-precision
    trap."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, p)


def layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def patch_embed(img: jnp.ndarray, p: Params, patch: int) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, N, D) via reshape + matmul (stride==kernel conv)."""
    b, h, w, c = img.shape
    gh, gw = h // patch, w // patch
    x = img.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, patch * patch * c)
    return x @ p["kernel"] + p["bias"]


def _block(x: jnp.ndarray, p: Params, num_heads: int,
           use_pallas: bool | None, fused: bool = False) -> jnp.ndarray:
    if fused:
        from ..ops import vit_block

        return vit_block.block(x, p, num_heads)
    h = layer_norm(x, p["ln1"])
    qkv = h @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    attn = multihead_attention(q, k, v, num_heads, use_pallas=use_pallas)
    x = x + attn @ p["proj"]["kernel"] + p["proj"]["bias"]
    h = layer_norm(x, p["ln2"])
    h = jax.nn.gelu(h @ p["mlp1"]["kernel"] + p["mlp1"]["bias"])
    x = x + h @ p["mlp2"]["kernel"] + p["mlp2"]["bias"]
    return x


def embed_template(params: Params, z_img: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Patch-embed the normalised template crop (B, Hz, Wz, 3) -> (B, Nz, D).

    This is the piece of the forward pass cached across frames in
    ``TrackState`` (the HBM-resident analog of the RKNN tracker's internal
    template cache, SURVEY.md §5 "checkpoint/resume")."""
    dt = _cdtype(cfg)
    pe = cast_params(params["patch_embed"], dt)
    tok = patch_embed(z_img.astype(dt), pe, cfg.patch_size)
    return tok + params["pos_embed_z"].astype(tok.dtype)


def embed_search(params: Params, x_img: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    dt = _cdtype(cfg)
    pe = cast_params(params["patch_embed"], dt)
    tok = patch_embed(x_img.astype(dt), pe, cfg.patch_size)
    return tok + params["pos_embed_x"].astype(tok.dtype)


def embed_search_patches(params: Params, patches: jnp.ndarray,
                         cfg: ModelConfig) -> jnp.ndarray:
    """Patch-embed pre-patchified search pixels: (p, N, p*3) -> (N, D).

    Companion to ``ops.preprocess.*(..., patch_major=p)``: the preprocess
    emits pixels already grouped per patch ROW (the 6-D patchify transpose
    of :func:`patch_embed` collapses to one major-axis swap with the
    (q, c)=p*3 minor dim kept contiguous).  The contraction is then the
    SAME (N, p*p*3) @ (p*p*3, D) matmul as :func:`patch_embed` —
    bit-identical tokens, cheaper relayout.

    MEASURED SLOWER than :func:`embed_search` end to end on v5e (embed
    ~0.044 vs ~0.016 ms; preprocess itself identical): XLA folds the 6-D
    patchify transpose into the matmul operand layout, while this path's
    explicit (p, N, k) -> (N, p, k) swap materialises.  A p-batched
    ``dot_general`` variant (no transpose at all) was worse still —
    sixteen K=48 matmuls underfill the MXU.  Kept as the natural input
    layout for a future hand-fused Pallas preprocess+embed kernel; NOT
    the serving default.  Don't revisit without new data.
    """
    dt = _cdtype(cfg)
    p, n = patches.shape[0], patches.shape[1]
    pe = params["patch_embed"]
    x = patches.astype(dt).transpose(1, 0, 2).reshape(n, p * patches.shape[2])
    tok = x @ pe["kernel"].astype(dt) + pe["bias"].astype(dt)
    return tok + params["pos_embed_x"].astype(tok.dtype)


def encode(params: Params, z_tok: jnp.ndarray, x_tok: jnp.ndarray,
           cfg: ModelConfig, use_pallas: bool | None = None,
           fused: bool | None = None) -> jnp.ndarray:
    """Joint encoding of [template; search] tokens.

    Returns the encoded *search* tokens (B, Nx, D) after the final LN —
    the input to the score/offset/size heads.

    ``fused=None`` auto-selects the fully-fused per-block Pallas kernel
    (ops/vit_block.py) on TPU for UNBATCHED (B=1) encodes — one kernel per
    block instead of ~10 XLA ops, keeping activations in VMEM (measured
    59.4 vs 70.7 us/encode on v5e; the kernel still edges XLA at B=2,
    113.5 vs 118.1 us, and loses from B>=4).  At real batch the per-sample
    grid programs lose to XLA's batched GEMMs (0.856 vs 0.820 ms at B=16), so
    batched callers (tracker/multi.py under vmap — where the traced shape
    is B=1 but the physical batch is S x M — and the training step) pass
    ``fused=False`` explicitly.  The kernel is trainable regardless
    (custom_vjp whose backward differentiates this XLA path).
    """
    dt = _cdtype(cfg)
    if fused is None:
        fused = jax.default_backend() == "tpu" and x_tok.shape[0] == 1
    x = jnp.concatenate([z_tok.astype(dt), x_tok.astype(dt)], axis=1)
    if fused and len(params["blocks"]) > 0:   # depth-0 (corr-tiny) has no
        from ..ops import vit_block           # blocks to fuse

        blocks = [cast_params(bp, dt) for bp in params["blocks"]]
        x = vit_block.encoder(x, blocks, cfg.num_heads)
    else:
        for bp in params["blocks"]:
            x = _block(x, cast_params(bp, dt), cfg.num_heads, use_pallas,
                       fused)
    x = layer_norm(x, params["norm"])
    return x[:, z_tok.shape[1]:, :]


def _cdtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
