"""Jitted (and shardable) training step for the VitTrack model.

Plain data-parallel by default; composes with parallel/sharding.py for
multi-chip dp x tp execution under a ``jax.sharding.Mesh`` (the mesh layout
and param partitioning live there — this module is mesh-agnostic pure
functions, the idiomatic JAX split).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models import vit
from ..models.heads import conv_head
from . import losses

Params = Dict[str, Any]


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-4):
    return optax.adamw(lr, weight_decay=weight_decay)


def create_train_state(params: Params, lr: float = 1e-4) -> TrainState:
    opt = make_optimizer(lr)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32))


def loss_fn(params: Params, z_imgs, x_imgs, gts, cfg: ModelConfig,
            use_pallas: bool | None = None):
    """Mean loss over the batch.  Inputs are normalised crops
    (B, Hz, Wz, 3), (B, Hx, Wx, 3) and (B, 4) crop-normalised gt boxes."""
    z_tok = vit.embed_template(params["backbone"], z_imgs, cfg)
    x_tok = vit.embed_search(params["backbone"], x_imgs, cfg)
    x_feat = vit.encode(params["backbone"], z_tok, x_tok, cfg,
                        use_pallas=use_pallas)
    score, offset, size = conv_head(params["head"], x_feat, cfg)

    def one(s, o, z, gt):
        return losses.total_loss(s, o, z, gt)

    total, parts = jax.vmap(one)(score, offset, size, gts)
    return total.mean(), {k: v.mean() for k, v in parts.items()}


@functools.partial(jax.jit, static_argnames=("cfg", "lr", "use_pallas"),
                   donate_argnums=(0,))
def train_step(state: TrainState, z_imgs, x_imgs, gts, cfg: ModelConfig,
               lr: float = 1e-4, use_pallas: bool | None = None
               ) -> Tuple[TrainState, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One optimisation step; state is donated (params update in place in
    HBM).  Under a mesh, sharding propagates from the input shardings."""
    (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, z_imgs, x_imgs, gts, cfg, use_pallas)
    opt = make_optimizer(lr)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (TrainState(new_params, new_opt, state.step + 1), loss, parts)
