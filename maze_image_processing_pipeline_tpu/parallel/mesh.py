"""Mesh construction and sharding specs for dp/sp/tp execution."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "shard_batch_spec", "shard_params", "replicate"]


def make_mesh(
    axis_sizes: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a named mesh over the available devices.

    Args:
        axis_sizes: e.g. ``{"data": 4, "model": 2}``. Defaults to all devices
            on one ``data`` axis. Sizes must multiply to ``len(devices)``.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"data": n}
    sizes = list(axis_sizes.values())
    if int(np.prod(sizes)) != n:
        raise ValueError(f"Mesh axes {axis_sizes} do not cover {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axis_sizes.keys()))


def shard_batch_spec(mesh: Mesh, ndim: int = 4) -> PartitionSpec:
    """Partition spec for an image batch (B, H, W, C): dp over 'data', sp over 'space'."""
    parts = []
    if "data" in mesh.axis_names:
        parts.append("data")
    else:
        parts.append(None)
    if "space" in mesh.axis_names and ndim >= 3:
        parts.append("space")
    while len(parts) < ndim:
        parts.append(None)
    return PartitionSpec(*parts)


def shard_params(params, mesh: Mesh, model_axis: str = "model", min_size: int = 64):
    """Place params on the mesh: wide trailing dims sharded over ``model``.

    Conv kernels (HWIO) and dense kernels shard their output-channel dim
    over the ``model`` axis when divisible and at least ``min_size`` wide;
    everything else is replicated. Returns the device-put pytree.
    """
    have_model = model_axis in mesh.axis_names
    size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(model_axis, 1)

    def place(a):
        a = np.asarray(a) if not isinstance(a, jax.Array) else a
        if (
            have_model
            and size > 1
            and a.ndim >= 2
            and a.shape[-1] % size == 0
            and a.shape[-1] >= min_size
        ):
            spec = PartitionSpec(*([None] * (a.ndim - 1) + [model_axis]))
        else:
            spec = PartitionSpec()
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
