"""Partitioned GraphCast processor: the multimesh trunk over a device mesh.

Reference: `models/graphcast/gnn_layers/distributed_graph.py` +
`distributed/utils.py:233-656` — nodewise graph partition with NCCL
variable-size all-to-alls around every processor layer.

TPU design: the partition plan (`graph_partition.partition_graph_nodewise`)
is static numpy; only the three index-space ops live inside `shard_map`
(padded-bucket `lax.all_to_all` + gathers + masked `segment_sum`), while the
per-layer MLPs run OUTSIDE on the globally node-/edge-sharded arrays — GSPMD
keeps them communication-free (weights replicated, leading dim sharded).
That split keeps flax parameter trees identical between the single-device
and partitioned models, so the same checkpoint runs either way.

Layout (P shards over `axis_name`):
- node features  [B, P*chunk, D]  (last rank's tail is padding)
- edge features  [B, P*Emax,  D]  (per-rank owned edges, dst-nodewise,
  padded; `plan.e_perm` maps global edge ids into this layout)
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dlwpbench_tpu.parallel.graph_partition import (
    GraphPartition,
    gather_src_features,
    partition_graph_nodewise,
)


class ProcessorPlan(NamedTuple):
    part: GraphPartition
    e_perm: np.ndarray  # [P*Emax] global edge ids feeding each rank-slot
    n_nodes: int  # dst node count (processor: == src node count)
    n_nodes_padded: int  # P * dst_chunk
    n_edges_padded: int  # P * Emax
    n_src: int = 0
    n_src_padded: int = 0  # P * src_chunk


class ProcessorOps(NamedTuple):
    plan: ProcessorPlan
    edge_ends: Callable  # nodes [B, P*chunk, D] -> (src_f, dst_f) [B, P*Emax, D]
    aggregate: Callable  # msgs [B, P*Emax, D] -> agg [B, P*chunk, D]


def build_processor_plan(
    src: np.ndarray, dst: np.ndarray, n_nodes: int, n_parts: int,
    n_src: int | None = None,
) -> ProcessorPlan:
    """Partition plan for one graph; bipartite when `n_src != n_nodes`.

    dst-nodewise ownership as in the reference's `DistributedGraph`
    (`gnn_layers/distributed_graph.py:78-227`): g2m partitions by MESH
    node chunks, m2g by GRID node chunks (`graph_cast_net.py:113-133`).
    """
    n_src = n_nodes if n_src is None else n_src
    part = partition_graph_nodewise(src, dst, n_src, n_nodes, n_parts)
    return ProcessorPlan(
        part=part,
        # the partition's own per-rank edge order (single source of truth)
        e_perm=part.edge_ids.reshape(-1),
        n_nodes=n_nodes,
        n_nodes_padded=n_parts * part.dst_chunk,
        n_edges_padded=n_parts * part.n_edges_max,
        n_src=n_src,
        n_src_padded=n_parts * part.src_chunk,
    )


# batched bucket-gather/all_to_all/concat: one implementation of the
# address-space protocol, shared with partitioned_message_passing
_gather_src_batched = gather_src_features


def _edge_ends_local(
    part: GraphPartition,
    src_local: jax.Array,
    dst_local: jax.Array | None,
    axis_name: str,
):
    """src_local: [.., src_chunk, F]; dst_local: [.., dst_chunk, F] or None
    (homogeneous graphs pass one array for both roles)."""
    if dst_local is None:
        dst_local = src_local
    r = lax.axis_index(axis_name)
    addr = _gather_src_batched(part, src_local, axis_name)
    e_src = jnp.asarray(part.edge_src_local)[r]
    e_dst = jnp.asarray(part.edge_dst_local)[r]
    src_f = jnp.take(addr, e_src, axis=-2)
    dst_f = jnp.take(dst_local, e_dst, axis=-2)
    return src_f, dst_f


def _aggregate_local(part: GraphPartition, msgs_local: jax.Array, axis_name: str):
    r = lax.axis_index(axis_name)
    e_dst = jnp.asarray(part.edge_dst_local)[r]
    e_mask = jnp.asarray(part.edge_mask)[r][..., None]
    masked = msgs_local * e_mask
    seg = lambda m: jax.ops.segment_sum(m, e_dst, num_segments=part.dst_chunk)
    for _ in range(masked.ndim - 2):
        seg = jax.vmap(seg)
    return seg(masked)


def make_graph_ops(
    mesh: Mesh,
    src: np.ndarray,
    dst: np.ndarray,
    n_dst: int,
    axis_name: str = "x",
    batch_dims: int = 1,
    n_src: int | None = None,
) -> ProcessorOps:
    """shard_map-wrapped index ops for one (possibly bipartite) graph.

    `edge_ends(src_nodes, dst_nodes)`: sharded node arrays
    [B, P*src_chunk, F] / [B, P*dst_chunk, F] -> per-edge end features
    [B, P*Emax, F] (one all_to_all moves boundary src features).
    `aggregate(msgs)`: [B, P*Emax, F] -> [B, P*dst_chunk, F] masked
    segment-sum onto owned dst nodes.
    """
    from jax import shard_map

    n_parts = mesh.shape[axis_name]
    plan = build_processor_plan(src, dst, n_dst, n_parts, n_src=n_src)
    part = plan.part
    lead = [None] * batch_dims
    spec = P(*lead, axis_name, None)

    def _ends(src_nodes, dst_nodes):
        return _edge_ends_local(part, src_nodes, dst_nodes, axis_name)

    edge_ends = shard_map(
        _ends, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec)
    )
    aggregate = shard_map(
        functools.partial(_aggregate_local, part, axis_name=axis_name),
        mesh=mesh,
        in_specs=spec,
        out_specs=spec,
    )
    return ProcessorOps(plan=plan, edge_ends=edge_ends, aggregate=aggregate)


def make_processor_ops(
    mesh: Mesh,
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    axis_name: str = "x",
    batch_dims: int = 1,
) -> ProcessorOps:
    """Homogeneous-graph ops (the multimesh processor trunk)."""
    return make_graph_ops(
        mesh, src, dst, n_nodes, axis_name, batch_dims, n_src=n_nodes
    )
