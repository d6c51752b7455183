"""Sharded HEALPix neighbor padding — faces distributed across chips.

SURVEY 'hard parts' #2: when the 12 HEALPix faces are sharded over the mesh,
the face-neighbor padding (rot90s + synthesized corners) must become a halo
exchange over ICI.  Because the single-device padding is already expressed as
a weighted gather over the flat [12*n*n] field (`grids.healpix
.build_pad_indices`), the distributed version falls out of the generic
partitioned message-passing machinery: treat every padded output pixel as a
dst node receiving from its (<=2) source pixels with the corner weights as
edge features, partition dst pixels by owning face, and exchange the needed
remote boundary pixels with one padded `all_to_all` (`parallel
.graph_partition`).  The exchanged volume per step is exactly the boundary
strips — a true halo exchange, not a face replication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dlwpbench_tpu.grids.healpix import build_pad_indices
from dlwpbench_tpu.parallel.graph_partition import (
    GraphPartition,
    partition_graph_nodewise,
    partitioned_message_passing,
)


@functools.lru_cache(maxsize=None)
def build_sharded_pad_plan(
    nside: int, padding: int, n_parts: int
) -> tuple[GraphPartition, np.ndarray]:
    """Partition plan + per-rank edge weights for the padded-pixel gather."""
    idx, w = build_pad_indices(nside, padding)  # [12, Hp, Wp, 2]
    npad = idx.size // 2
    n_src = 12 * nside * nside
    src = idx.reshape(-1)  # [2*npad] (pairs interleaved)
    dst = np.repeat(np.arange(npad), 2)
    part = partition_graph_nodewise(src, dst, n_src, npad, n_parts)

    # per-rank edge weights permuted by the partition's OWN edge order
    # (part.edge_ids — never re-derive the ordering rule here)
    weights = w.reshape(-1)  # [2*npad]
    ew = np.where(part.edge_mask, weights[part.edge_ids], 0.0)
    return part, ew[..., None].astype(np.float32)


def sharded_healpix_pad(
    x_local: jax.Array, nside: int, padding: int, axis_name: str
) -> jax.Array:
    """Inside shard_map: local face pixels -> local padded faces.

    x_local: [src_chunk, C] = this rank's slice of the flattened
    [12*nside*nside, C] field (faces sharded contiguously; pad the global
    field to n_parts * src_chunk rows before sharding).

    Returns [dst_chunk, C]: this rank's slice of the flattened padded
    [12 * (nside+2p)^2, C] field.
    """
    from jax import lax

    p = lax.axis_size(axis_name)
    part, ew = build_sharded_pad_plan(nside, padding, p)
    r = lax.axis_index(axis_name)
    ew_local = jnp.asarray(ew)[r]
    return partitioned_message_passing(part, x_local, ew_local, axis_name)


def make_sharded_healpix_pad(mesh, nside: int, padding: int, axis_name: str = "x"):
    """Returns a jitted op: [12, n, n, C] (globally sharded on faces) ->
    [12, n+2p, n+2p, C] sharded the same way."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_parts = mesh.shape[axis_name]
    part, _ = build_sharded_pad_plan(nside, padding, n_parts)
    Hp = nside + 2 * padding

    def fn(x):  # x: [12, n, n, C] global
        C = x.shape[-1]
        flat = x.reshape(12 * nside * nside, C)
        pad_rows = part.n_parts * part.src_chunk - flat.shape[0]
        flat = jnp.pad(flat, ((0, pad_rows), (0, 0)))

        out = shard_map(
            lambda xl: sharded_healpix_pad(xl, nside, padding, axis_name),
            mesh=mesh,
            in_specs=P(axis_name, None),
            out_specs=P(axis_name, None),
        )(flat)
        return out.reshape(-1, C)[: 12 * Hp * Hp].reshape(12, Hp, Hp, C)

    return fn
