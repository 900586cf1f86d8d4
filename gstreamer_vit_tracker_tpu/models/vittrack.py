"""VitTrack model: joint template/search ViT encoder + prediction heads.

The full TPU-native replacement for the RKNN model + vit_tracker crate the
reference drives through ``VitTrack::{new, init, update}``
(/root/reference/src/tracker_context.rs:21,88,120; SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import heads as heads_mod
from . import vit

Params = Dict[str, Any]


class TrackMaps(NamedTuple):
    score: jnp.ndarray    # (B, fs, fs)
    offset: jnp.ndarray   # (B, fs, fs, 2)
    size: jnp.ndarray     # (B, fs, fs, 2)


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    k1, k2 = jax.random.split(key)
    params: Params = {"backbone": vit.init_vit_params(k1, cfg)}
    if cfg.head_mode == "conv":
        params["head"] = heads_mod.init_head_params(k2, cfg)
    return params


def embed_template(params: Params, z_img: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Normalised template crop (B, Hz, Wz, 3) -> cached template tokens.

    This is the persistent per-target state: computed once at ``init`` (and
    on online template updates), carried in HBM across every ``update``.
    """
    return vit.embed_template(params["backbone"], z_img, cfg)


def forward(params: Params, z_tok: jnp.ndarray, x_img: jnp.ndarray,
            cfg: ModelConfig, use_pallas: bool | None = None,
            fused: bool | None = None) -> TrackMaps:
    """One tracking forward pass.

    z_tok: (B, Nz, D) cached template tokens;
    x_img: (B, Hx, Wx, 3) normalised search crop.
    """
    x_tok = vit.embed_search(params["backbone"], x_img, cfg)
    return forward_tokens(params, z_tok, x_tok, cfg, use_pallas=use_pallas,
                          fused=fused)


def embed_search_patches(params: Params, patches: jnp.ndarray,
                         cfg: ModelConfig) -> jnp.ndarray:
    """(p, N, p*3) patch-major search pixels -> (N, D) embedded tokens
    (vit.py::embed_search_patches; pairs with preprocess ``patch_major``)."""
    return vit.embed_search_patches(params["backbone"], patches, cfg)


def forward_tokens(params: Params, z_tok: jnp.ndarray, x_tok: jnp.ndarray,
                   cfg: ModelConfig, use_pallas: bool | None = None,
                   fused: bool | None = None) -> TrackMaps:
    """Forward from already-embedded search tokens (B, Nx, D)."""
    x_feat = vit.encode(params["backbone"], z_tok.astype(x_tok.dtype), x_tok,
                        cfg, use_pallas=use_pallas, fused=fused)
    if cfg.head_mode == "conv":
        g = params.get("head_grouped")
        # ``fused=False`` is the physically-batched-caller signal
        # (tracker/multi.py): there the 12 tower convs amortise their
        # launch cost over the batch while the grouped head's
        # block-diagonal FLOP waste scales with it — so, like the fused
        # encoder, the derived head serves only the unbatched path.
        if g is not None and fused is not False:
            score, offset, size = heads_mod.conv_head_grouped(g, x_feat, cfg)
        else:
            score, offset, size = heads_mod.conv_head(params["head"],
                                                      x_feat, cfg)
    else:
        score, offset, size = heads_mod.corr_head(z_tok, x_feat, cfg)
    return TrackMaps(score=score, offset=offset, size=size)


def with_grouped_head(params: Params) -> Params:
    """Serving-time param prep: attach the derived 4-conv grouped head
    (models/heads.py::group_head_params).  Call once after checkpoint
    load; training and import paths keep the tower layout."""
    if "head" not in params or "head_grouped" in params:
        return params
    out = dict(params)
    out["head_grouped"] = heads_mod.group_head_params(params["head"])
    return out


def count_params(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
