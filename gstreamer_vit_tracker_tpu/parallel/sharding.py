"""Sharding rules: how params, optimizer state, and batches lay out on the
mesh.

Tensor-parallel layout for the ViT blocks (the Megatron split, expressed as
PartitionSpecs — XLA inserts the all-reduces):

* qkv kernel  (D, 3D)      -> (None, 'model')   column-parallel
* qkv bias    (3D,)        -> ('model',)
* proj kernel (D, D)       -> ('model', None)   row-parallel
* mlp1 kernel (D, H)       -> (None, 'model')   column-parallel
* mlp1 bias   (H,)         -> ('model',)
* mlp2 kernel (H, D)       -> ('model', None)   row-parallel
* everything else          -> replicated

Batches shard their leading axis over 'data'.  For clean head-parallel
attention, ``num_heads`` should be divisible by the model-axis size; XLA
still compiles correct (if slower) programs otherwise.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_pspec(path, leaf) -> P:
    name = _path_str(path)
    if "qkv/kernel" in name:
        return P(None, MODEL_AXIS)
    if "qkv/bias" in name:
        return P(MODEL_AXIS)
    if "proj/kernel" in name:
        return P(MODEL_AXIS, None)
    if "mlp1/kernel" in name:
        return P(None, MODEL_AXIS)
    if "mlp1/bias" in name:
        return P(MODEL_AXIS)
    if "mlp2/kernel" in name:
        return P(MODEL_AXIS, None)
    return P()  # replicated


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree on the mesh per :func:`param_pspec`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, NamedSharding(mesh, param_pspec(path, x))),
        params)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard the leading axis of every leaf over the 'data' axis."""

    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
