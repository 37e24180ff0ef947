"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """1-D device mesh over the first n (default: all) devices.

    The workloads here shard only one thing — the batch axis in training, the
    tile axis in inference — so a 1-D mesh suffices; on real slices the device
    order jax reports already follows the ICI torus for contiguous axes.
    """
    devices = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devices), (n_devices, len(devices))
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch/tile) axis of an array over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
