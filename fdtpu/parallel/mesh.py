"""Mesh construction and sharding helpers.

Conventions:

* axis ``"data"`` — batch dimension (gradient all-reduce rides ICI);
* axis ``"spatial"`` — optional image-height partitioning for very large
  inputs (XLA inserts halo exchanges for convolutions); the CNN analogue of
  sequence parallelism, unused by default (SURVEY.md §5: no sequence axis
  exists in this workload).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int | None = None,
    spatial: int = 1,
    devices=None,
) -> Mesh:
    """1-D data mesh by default; ``spatial > 1`` folds a second axis."""
    devices = devices if devices is not None else jax.devices()
    n = num_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_mesh needs {n} devices but only {len(devices)} are "
            f"visible (platform {devices[0].platform!r}). For CPU testing, "
            "set XLA_FLAGS=--xla_force_host_platform_device_count=N and "
            'force jax.config.update("jax_platforms", "cpu") before any '
            "backend use (the axon TPU plugin ignores JAX_PLATFORMS)."
        )
    devices = np.asarray(devices[:n])
    if spatial > 1:
        assert n % spatial == 0, (n, spatial)
        return Mesh(
            devices.reshape(n // spatial, spatial), axis_names=("data", "spatial")
        )
    return Mesh(devices, axis_names=("data",))


def batch_sharding(mesh: Mesh, ndim: int, spatial_dim: int | None = None):
    """NamedSharding for a batch-leading array: dim 0 over 'data', optionally
    ``spatial_dim`` over 'spatial'."""
    spec = [None] * ndim
    spec[0] = "data"
    if spatial_dim is not None and "spatial" in mesh.axis_names:
        spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, *arrays, spatial_image_dim: int | None = None):
    """Device-put arrays with batch-dim sharding (images optionally spatial)."""
    out = []
    for a in arrays:
        sd = spatial_image_dim if (a.ndim == 4) else None
        out.append(jax.device_put(a, batch_sharding(mesh, a.ndim, sd)))
    return tuple(out)
