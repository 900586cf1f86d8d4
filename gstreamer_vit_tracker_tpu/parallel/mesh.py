"""Device-mesh construction helpers.

The reference is strictly single-accelerator (one Rockchip NPU;
SURVEY.md §2 checklist: TP/SP/EP/CP ABSENT).  The TPU framework scales two
ways instead — multi-stream serving sharded over a 'data' axis and
tensor-parallel training over a 'model' axis — both expressed as a
``jax.sharding.Mesh`` over ICI-connected chips with XLA inserting the
collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
              devices=None) -> Mesh:
    """Build a (data, model) mesh.

    ``shape=None`` uses all devices as (n, 1) — pure data parallel.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    n = shape[0] * shape[1]
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def factor_mesh(n_devices: int) -> Tuple[int, int]:
    """Pick a (data, model) factorisation: prefer model-parallel width 2
    when it divides, else pure DP."""
    if n_devices % 2 == 0 and n_devices >= 4:
        return (n_devices // 2, 2)
    return (n_devices, 1)
