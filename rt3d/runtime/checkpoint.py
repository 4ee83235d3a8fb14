"""Checkpoint / resume for pipeline + tracker + train state.

The reference has NO checkpointing — its only cross-frame state hides in
the ultralytics tracker (`persist=True`, `2cams_mask_gpu.py:275`). In rt3d
every piece of cross-frame state is an explicit pytree, so checkpointing is
a flatten + save: model params, tracker state (Kalman means/covs, ids,
counters) and train state all round-trip through one .npz.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat = {}
    for path, leaf in leaves_with_paths:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(path: str, tree: Any) -> None:
    np.savez_compressed(path, **_flatten(tree))


def load_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (shapes/dtypes must match)."""
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for p, leaf in leaves_with_paths:
        key = "/".join(str(q) for q in p)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = data[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(f"{key}: shape {arr.shape} != {leaf.shape}")
        new_leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
