"""Device mesh + sharding helpers (the reference's DistributedManager analog).

The reference builds torch.distributed process groups with named subgroups
and orthogonal 2D topologies (`models/graphcast/distributed/manager.py`).
The TPU-native equivalent is a named `jax.sharding.Mesh`:

- axis "data"  — batch/data parallelism (DCN-friendly);
- axis "x"     — spatial domain decomposition over latitude rows / HEALPix
  faces (ICI-friendly; GSPMD inserts halo collective-permutes for convs).

Everything downstream annotates arrays with `NamedSharding` partition specs
and lets GSPMD/XLA insert the collectives; explicit `shard_map` kernels
(distributed FFT/SHT, graph exchange) build on the same mesh.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    data: int | None = None,
    x: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Create a ("data", "x") mesh over the available devices."""
    devices = list(devices or jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if data is None:
        data = n // x
    assert data * x == n, f"mesh {data}x{x} != {n} devices"
    return Mesh(np.array(devices).reshape(data, x), ("data", "x"))


def batch_spec(ndim: int, spatial_axis: int | None = None) -> P:
    """PartitionSpec: batch on "data", optional spatial dim on "x"."""
    spec = [None] * ndim
    spec[0] = "data"
    if spatial_axis is not None:
        spec[spatial_axis] = "x"
    return P(*spec)


def shard_batch(mesh: Mesh, batch, spatial_axis: int | None = None):
    """device_put a (constants, prescribed, prognostic, target) tuple with
    batch sharded on "data" and (optionally) a spatial dim on "x".

    `spatial_axis` indexes into the per-array dims (channel-first contract:
    [B, T, C, H, W] -> spatial_axis=3 shards latitude rows)."""
    out = []
    for arr in batch:
        if arr is None:
            out.append(None)
            continue
        ax = spatial_axis if spatial_axis is not None and arr.ndim > spatial_axis else None
        out.append(
            jax.device_put(arr, NamedSharding(mesh, batch_spec(arr.ndim, ax)))
        )
    return tuple(out)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. params) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
