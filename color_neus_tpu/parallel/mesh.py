"""Device mesh construction and canonical shardings."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


RAY_AXIS = "dp"


def make_mesh(n_devices: int | None = None, axis: str = RAY_AXIS) -> Mesh:
    """1-D mesh over the first n_devices local/global devices.

    Rays (and their 128-sample point batches) are embarrassingly parallel,
    so a single data axis is the right topology; the model is tiny and
    replicated (no tensor parallelism needed at 1.4M params — SURVEY §2.2).
    """
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (ray) axis, replicate the rest."""
    return NamedSharding(mesh, P(RAY_AXIS, *([None] * (ndim - 1))))
