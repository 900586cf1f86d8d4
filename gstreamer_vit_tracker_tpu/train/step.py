"""Jitted (and shardable) training step for the VitTrack model.

Plain data-parallel by default; composes with parallel/sharding.py for
multi-chip dp x tp execution under a ``jax.sharding.Mesh`` (the mesh layout
and param partitioning live there — this module is mesh-agnostic pure
functions, the idiomatic JAX split).

The optimizer is built ONCE outside the jitted step and passed in as a
static argument (an ``optax.GradientTransformation`` is a NamedTuple of
functions — hashable by identity, so reusing the same object never
retraces).  That is what makes LR schedules, gradient clipping and EMA
possible without retracing per step: the schedule reads the step count out
of ``opt_state`` on device.

For long runs, :func:`train_scan` runs many steps inside one
``lax.scan`` with on-device minibatch sampling + augmentation from an
HBM-resident uint8 dataset — one dispatch per log interval instead of one
per step, which matters when every dispatch pays a ~30 ms relay round-trip
(docs/ARCHITECTURE.md perf notes).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

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
    # Exponential moving average of params (None disables; created by
    # create_train_state(ema_decay>0) as a distinct copy — donation rejects
    # aliased buffers).
    ema_params: Optional[Params] = None


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-4,
                   *, total_steps: Optional[int] = None,
                   warmup_steps: int = 0, end_lr_frac: float = 0.05,
                   clip_norm: Optional[float] = 1.0
                   ) -> optax.GradientTransformation:
    """AdamW with optional warmup+cosine schedule and global-norm clipping.

    With ``total_steps`` set, LR warms up linearly for ``warmup_steps`` then
    cosine-decays to ``lr * end_lr_frac``; otherwise LR is constant.
    """
    if total_steps:
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
            decay_steps=total_steps, end_value=lr * end_lr_frac)
    else:
        sched = lr
    chain = []
    if clip_norm:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(optax.adamw(sched, weight_decay=weight_decay))
    return optax.chain(*chain)


def create_train_state(params: Params, lr: float = 1e-4,
                       opt: Optional[optax.GradientTransformation] = None,
                       ema_decay: float = 0.0) -> TrainState:
    opt = opt if opt is not None else make_optimizer(lr)
    ema = jax.tree.map(jnp.copy, params) if ema_decay > 0 else None
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32), ema_params=ema)


def loss_fn(params: Params, z_imgs, x_imgs, gts, cfg: ModelConfig,
            use_pallas: bool | None = None):
    """Mean loss over the batch.  Inputs are normalised crops
    (B, Hz, Wz, 3), (B, Hx, Wx, 3) and (B, 4) crop-normalised gt boxes —
    or (B, 5) with a trailing per-sample visibility flag (0 = target fully
    occluded in the search crop; trains the all-negative score map)."""
    z_tok = vit.embed_template(params["backbone"], z_imgs, cfg)
    x_tok = vit.embed_search(params["backbone"], x_imgs, cfg)
    # fused=False: training always uses the XLA encoder (the fused
    # kernel's forward + reference backward would mix implementations,
    # and its B=1 auto-select could otherwise trigger on debug runs).
    x_feat = vit.encode(params["backbone"], z_tok, x_tok, cfg,
                        use_pallas=use_pallas, fused=False)
    score, offset, size = conv_head(params["head"], x_feat, cfg)

    def one(s, o, z, gt):
        vis = gt[4] if gt.shape[0] == 5 else None
        return losses.total_loss(s, o, z, gt[:4], visible=vis)

    total, parts = jax.vmap(one)(score, offset, size, gts)
    return total.mean(), {k: v.mean() for k, v in parts.items()}


def _step_impl(state: TrainState, z_imgs, x_imgs, gts, cfg: ModelConfig,
               opt: optax.GradientTransformation,
               use_pallas: bool | None, ema_decay: float):
    (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, z_imgs, x_imgs, gts, cfg, use_pallas)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    ema = state.ema_params
    if ema is not None and ema_decay > 0:
        ema = jax.tree.map(lambda e, p: e * ema_decay + p * (1 - ema_decay),
                           ema, new_params)
    return (TrainState(new_params, new_opt, state.step + 1, ema),
            loss, parts)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "lr", "use_pallas", "opt",
                                    "ema_decay"),
                   donate_argnums=(0,))
def train_step(state: TrainState, z_imgs, x_imgs, gts, cfg: ModelConfig,
               lr: float = 1e-4, use_pallas: bool | None = None,
               opt: Optional[optax.GradientTransformation] = None,
               ema_decay: float = 0.0
               ) -> Tuple[TrainState, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One optimisation step; state is donated (params update in place in
    HBM).  Under a mesh, sharding propagates from the input shardings.
    Pass the SAME ``opt`` object every call (it is jit-static); with
    ``opt=None`` a constant-LR AdamW(lr) is built, matching the legacy
    signature."""
    opt = opt if opt is not None else make_optimizer(lr)
    return _step_impl(state, z_imgs, x_imgs, gts, cfg, opt, use_pallas,
                      ema_decay)


# ---------------------------------------------------------------------------
# Scanned multi-step training from an HBM-resident dataset.
# ---------------------------------------------------------------------------


def _augment(key, z, x, gt, mean, std):
    """On-device per-sample augmentation of uint8 crops -> normalised f32.

    Horizontal flip (geometry-consistent: cx -> 1-cx), shared
    brightness/contrast jitter across template+search (same lighting), and
    light gaussian noise.  All elementwise — fuses into the gather.
    """
    b = z.shape[0]
    kf, kc, kb, kn = jax.random.split(key, 4)
    zf = z.astype(jnp.float32) / 255.0
    xf = x.astype(jnp.float32) / 255.0

    flip = jax.random.bernoulli(kf, 0.5, (b,))
    zf = jnp.where(flip[:, None, None, None], zf[:, :, ::-1, :], zf)
    xf = jnp.where(flip[:, None, None, None], xf[:, :, ::-1, :], xf)
    # Width-agnostic (gt is (B, 4) or (B, 5) with a visibility flag):
    # a horizontal flip negates only cx.
    gt = jnp.where(flip[:, None],
                   jnp.concatenate([1.0 - gt[:, :1], gt[:, 1:]], axis=-1),
                   gt)

    contrast = jax.random.uniform(kc, (b, 1, 1, 1), minval=0.8, maxval=1.2)
    bright = jax.random.uniform(kb, (b, 1, 1, 1), minval=-0.08, maxval=0.08)
    zf = zf * contrast + bright
    xf = xf * contrast + bright
    xf = xf + 0.01 * jax.random.normal(kn, xf.shape)

    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (zf - mean) / std, (xf - mean) / std, gt


@functools.partial(jax.jit,
                   static_argnames=("cfg", "opt", "n_steps", "batch",
                                    "use_pallas", "ema_decay", "augment"),
                   donate_argnums=(0,))
def train_scan(state: TrainState, ds_z, ds_x, ds_gt, key,
               cfg: ModelConfig, opt: optax.GradientTransformation,
               n_steps: int, batch: int, use_pallas: bool | None = None,
               ema_decay: float = 0.0, augment: bool = True):
    """Run ``n_steps`` optimisation steps in one XLA program.

    ``ds_z``/``ds_x`` are uint8 crop stacks (N, H, W, 3) resident in HBM;
    each scanned step draws a with-replacement minibatch on device,
    augments, normalises and steps.  Returns (state, key, losses[n_steps],
    parts{name: [n_steps]}).
    """
    mean, std = cfg.norm_mean, cfg.norm_std

    def body(carry, _):
        st, k = carry
        k, ki, ka = jax.random.split(k, 3)
        idx = jax.random.randint(ki, (batch,), 0, ds_z.shape[0])
        z, x, gt = ds_z[idx], ds_x[idx], ds_gt[idx]
        if augment:
            z, x, gt = _augment(ka, z, x, gt, mean, std)
        else:
            z = (z.astype(jnp.float32) / 255.0 - jnp.asarray(mean)) / jnp.asarray(std)
            x = (x.astype(jnp.float32) / 255.0 - jnp.asarray(mean)) / jnp.asarray(std)
        st, loss, parts = _step_impl(st, z, x, gt, cfg, opt, use_pallas,
                                     ema_decay)
        return (st, k), (loss, parts)

    (state, key), (ls, parts) = jax.lax.scan(body, (state, key), None,
                                             length=n_steps)
    return state, key, ls, parts
