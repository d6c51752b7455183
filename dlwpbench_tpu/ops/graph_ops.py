"""Graph message-passing ops: segment-sum aggregation + the Modulus-style
GNN building blocks (reference `models/graphcast/gnn_layers/*`).

The reference leans on DGL's C++/CUDA scatter-gather kernels; on TPU the same
message passing is expressed with static-shape `jax.ops.segment_sum` over
precomputed (src, dst) index vectors — XLA lowers this to efficient
one-hot/scatter adds, and every MLP is a batched MXU matmul over edges/nodes.

Blocks (exact wiring from the reference):
- MeshGraphMLP (`mesh_graph_mlp.py:103-196`): Linear -> act, (hidden_layers-1)
  more, final Linear, optional LayerNorm.
- MeshEdgeBlock (`mesh_edge_block.py:30-94`):
  e' = MLP(cat(e, n_src[src], n_dst[dst])) + e.
- MeshNodeBlock (`mesh_node_block.py:30-93`):
  n' = MLP(cat(segsum_e->dst, n)) + n.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def aggregate(
    efeat: jax.Array, dst: jax.Array, n_dst: int, mode: str = "sum"
) -> jax.Array:
    """Aggregate edge features onto destination nodes.

    efeat: [..., E, F]; dst: [E] int; returns [..., n_dst, F].
    Leading batch dims are vmapped.
    """
    def agg1(e):
        out = jax.ops.segment_sum(e, dst, num_segments=n_dst)
        if mode == "mean":
            cnt = jax.ops.segment_sum(
                jnp.ones((e.shape[0], 1), e.dtype), dst, num_segments=n_dst
            )
            out = out / jnp.maximum(cnt, 1.0)
        return out

    if efeat.ndim == 2:
        return agg1(efeat)
    flat = efeat.reshape(-1, *efeat.shape[-2:])
    out = jax.vmap(agg1)(flat)
    return out.reshape(*efeat.shape[:-2], n_dst, efeat.shape[-1])


class MeshGraphMLP(nn.Module):
    output_dim: int = 512
    hidden_dim: int = 512
    hidden_layers: int = 1
    norm: bool = True  # final LayerNorm (norm_type="LayerNorm")
    activation: Callable = nn.silu

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.hidden_layers == 0:
            # degenerate: single linear (reference uses nn.Linear directly)
            return nn.Dense(self.output_dim)(x)
        x = self.activation(nn.Dense(self.hidden_dim)(x))
        for _ in range(self.hidden_layers - 1):
            x = self.activation(nn.Dense(self.hidden_dim)(x))
        x = nn.Dense(self.output_dim)(x)
        if self.norm:
            # torch nn.LayerNorm eps (the reference default), not flax's 1e-6
            x = nn.LayerNorm(epsilon=1e-5)(x)
        return x


class MeshEdgeBlock(nn.Module):
    output_dim: int = 512
    hidden_dim: int = 512
    hidden_layers: int = 1
    activation: Callable = nn.silu

    @nn.compact
    def __call__(self, efeat, src_nfeat, dst_nfeat, src, dst, pregathered=False):
        """efeat [..., E, Fe]; {src,dst}_nfeat [..., N, Fn]; src/dst [E].

        `pregathered=True`: {src,dst}_nfeat are already per-edge [..., E, Fn]
        (the partitioned processor gathers them with shard_map collectives,
        `parallel/graphcast_dist.py`) and src/dst are ignored.
        """
        if pregathered:
            cat = jnp.concatenate([efeat, src_nfeat, dst_nfeat], axis=-1)
        else:
            cat = jnp.concatenate(
                [
                    efeat,
                    jnp.take(src_nfeat, src, axis=-2),
                    jnp.take(dst_nfeat, dst, axis=-2),
                ],
                axis=-1,
            )
        mlp = MeshGraphMLP(
            self.output_dim, self.hidden_dim, self.hidden_layers,
            activation=self.activation,
        )
        return mlp(cat) + efeat


class MeshNodeBlock(nn.Module):
    output_dim: int = 512
    hidden_dim: int = 512
    hidden_layers: int = 1
    aggregation: str = "sum"
    activation: Callable = nn.silu

    @nn.compact
    def __call__(self, efeat, nfeat, dst, n_nodes, preaggregated=False):
        """`preaggregated=True`: efeat is already the per-node aggregation
        [..., N, F] (partitioned path) and dst/n_nodes are ignored."""
        if preaggregated:
            agg = efeat
        else:
            agg = aggregate(efeat, dst, n_nodes, self.aggregation)
        cat = jnp.concatenate([agg, nfeat], axis=-1)
        mlp = MeshGraphMLP(
            self.output_dim, self.hidden_dim, self.hidden_layers,
            activation=self.activation,
        )
        return mlp(cat) + nfeat
