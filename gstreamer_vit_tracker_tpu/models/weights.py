"""Model parameter persistence: save/load as npz and Orbax checkpoints.

The reference loads a fixed .rknn blob from disk at startup
(/root/reference/src/main.rs:25,38-40; tracker_context.rs:21).  Here
weights are an explicit JAX pytree; persistence is first-class (SURVEY.md
§5 mandates checkpoint/resume as a designed-in capability rather than the
reference's implicit NPU-side template cache).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _flatten(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def save_npz(path: str, params: Params, dtype=None) -> None:
    """Save a flattened npz; ``dtype`` (e.g. np.float16) downcasts float
    arrays for compact artifacts (loaders cast back to the model dtype)."""
    flat = _flatten(params)
    if dtype is not None:
        flat = {k: (v.astype(dtype) if np.issubdtype(v.dtype, np.floating)
                    else v) for k, v in flat.items()}
    np.savez(path, **flat)


def load_npz(path: str, like: Params) -> Params:
    """Load weights saved by :func:`save_npz` into the structure of ``like``
    (shapes are validated)."""
    flat = dict(np.load(path))

    def rebuild(tree: Any, prefix: str = "") -> Any:
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        key = prefix[:-1]
        if key not in flat:
            raise KeyError(f"checkpoint missing parameter {key!r}")
        arr = flat[key]
        if arr.shape != tree.shape:
            raise ValueError(f"shape mismatch for {key!r}: "
                             f"checkpoint {arr.shape} vs model {tree.shape}")
        return jnp.asarray(arr, tree.dtype)

    return rebuild(like)


def save_orbax(path: str, tree: Any) -> None:
    """Checkpoint an arbitrary pytree (params, TrackState, optimizer state)
    with Orbax — the production checkpoint path."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)


def load_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), item=like)
    return jax.tree.map(jnp.asarray, restored)
