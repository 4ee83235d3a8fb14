"""Mesh construction and parameter sharding rules."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Dict[str, int], devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build a mesh with named axes, e.g. {'dp': 2, 'fsdp': 2, 'cam': 2}.

    Collectives along the later (minor) axes ride the fastest links, so put
    the chattiest axis last ('cam' fusion gathers, fsdp all-gathers).
    """
    devices = list(devices if devices is not None else jax.devices())
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    need = int(np.prod(sizes))
    if need > len(devices):
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(sizes)
    return Mesh(dev, names)


def fsdp_param_shardings(params, mesh: Mesh, axis: str = "fsdp"):
    """Shard each parameter's largest divisible dimension along `axis`
    (classic FSDP-style weight sharding); replicate anything too small."""
    size = mesh.shape[axis]

    def rule(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, P())
        dims = list(x.shape)
        best, best_dim = None, -1
        for d, n in enumerate(dims):
            if n % size == 0 and n >= size and n > best_dim:
                best, best_dim = d, n
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(rule, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "dp"):
    return NamedSharding(mesh, P(axis))
