"""Halo exchange for domain-decomposed grids (shard_map + ppermute).

The reference's spatial model parallelism keeps node/row blocks resident per
rank and exchanges boundaries via NCCL (`distributed_graph.py`,
`mappings.py`).  The TPU-native equivalent: latitude rows are sharded over
the mesh axis "x"; each conv step exchanges `halo` boundary rows with the
two neighbors over ICI via `lax.ppermute`, with zero (pole) boundaries at the
ends — exactly the CylinderPad boundary condition, distributed.

These helpers are meant to be called INSIDE `shard_map`-decorated functions;
`sharded_cylinder_pad` is the drop-in distributed version of
`ops.padding.cylinder_pad` for [..., H_local, W] blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def halo_exchange_rows(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Exchange `halo` rows (axis -2) with mesh neighbors along `axis_name`.

    Returns x extended to [..., H_local + 2*halo, W]; the first/last shard
    get zero rows at the pole boundaries.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    top = x[..., :halo, :]  # rows to send upward (to rank-1)
    bot = x[..., -halo:, :]  # rows to send downward (to rank+1)

    # receive from rank-1 its bottom rows; from rank+1 its top rows
    from_prev = lax.ppermute(
        bot, axis_name, perm=[(i, (i + 1) % n) for i in range(n)]
    )
    from_next = lax.ppermute(
        top, axis_name, perm=[(i, (i - 1) % n) for i in range(n)]
    )

    zero = jnp.zeros_like(top)
    from_prev = jnp.where(idx == 0, zero, from_prev)
    from_next = jnp.where(idx == n - 1, zero, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=-2)


def sharded_cylinder_pad(x: jax.Array, padding: int, axis_name: str) -> jax.Array:
    """Distributed CylinderPad: circular in longitude (local), halo-exchange
    + zero poles in latitude (across shards)."""
    p = padding
    if p == 0:  # match ops.padding.cylinder_pad (x[..., -0:] would be all of W)
        return x
    x = jnp.concatenate([x[..., -p:], x, x[..., :p]], axis=-1)
    return halo_exchange_rows(x, p, axis_name)
