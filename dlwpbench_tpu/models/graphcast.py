"""GraphCastNet — reference `models/graphcast/graph_cast_net.py` (+5k LoC of
gnn_layers/utils), rebuilt on numpy graph arrays + segment-sum ops.

Architecture (reference `:475-569` + gnn_layers):
- grid input [B, C, H, W] -> node features [B, H*W, C];
- GraphCastEncoderEmbedder: 4 MLPs embedding grid nodes, mesh node features
  (cos lat/sin lon/cos lon), g2m edge features, multimesh edge features
  (`gnn_layers/embedder.py:27-127`);
- MeshGraphEncoder (g2m): e' = MLP(cat(e, grid[src], mesh[dst])),
  mesh += MLP(cat(segsum e'->mesh, mesh)), grid += MLP(grid)
  (`mesh_graph_encoder.py:123-138`);
- processor: `processor_layers` pairs of MeshEdgeBlock/MeshNodeBlock over the
  multimesh, first/last pairs acting as processor encoder/decoder around the
  trunk (`graph_cast_processor.py:59-180`, `graph_cast_net.py:518-523`);
- MeshGraphDecoder (m2g): embed m2g edges, e' = MLP(cat(e, mesh[src],
  grid[dst])), grid += MLP(cat(segsum e'->grid, grid)); final MLP (no norm)
  to prognostic channels (`mesh_graph_decoder.py`, `graph_cast_net.py:363-371`);
- rollout/residual semantics from `RolloutModel`.

The reference constrains batch_size==1 (`graph_cast_net.py:696-697`); this
implementation is batch-polymorphic (graph ops vmap over batch).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dlwpbench_tpu.grids.mesh_graph import build_graphcast_graphs
from dlwpbench_tpu.models.base import RolloutModel
from dlwpbench_tpu.ops.graph_ops import (
    EdgeMovement,
    MeshEdgeBlock,
    MeshGraphMLP,
    MeshNodeBlock,
)


class GraphCastNet(RolloutModel):
    """Reference `GraphCastNet` (config `type: GraphCastNet`)."""

    name: str = "graphcast"
    input_height: int = 32
    input_width: int = 64
    constant_channels: int = 4
    prescribed_channels: int = 1
    prognostic_channels: int = 8
    mesh_level: int = 3
    input_dim_mesh_nodes: int = 3
    input_dim_edges: int = 4
    processor_layers: int = 16
    hidden_layers: int = 1
    hidden_dim: int = 512
    aggregation: str = "sum"
    context_size: int = 1
    mesh: str = "equirectangular"
    # "cell_centers" (ours) or "pole_inclusive" (the reference's grid,
    # `graph_cast_net.py:189-193`) — see `grids/mesh_graph.py`
    grid_convention: str = "cell_centers"
    # "rad" (sane) or "deg_quirk" (the reference's degrees-into-cos/sin
    # mesh node features, `graph_utils.py:153-176`) — see `grids/mesh_graph.py`
    node_feat_unit: str = "rad"
    spmd_mesh: Any = None  # jax Mesh: partition the processor over dist_axis
    dist_axis: str = "x"
    # edge-movement implementation: "auto" (one-hot MXU matmuls on TPU for
    # small graphs, gather/segment_sum otherwise), "onehot", or "gather"
    movement_impl: str = "auto"

    @nn.compact
    def step(self, x: jax.Array, state: Any) -> tuple[jax.Array, Any]:
        B, H, W, Cin = x.shape
        D, hl = self.hidden_dim, self.hidden_layers
        mesh_g, g2m, m2g, mesh_nfeat0, _, _ = build_graphcast_graphs(
            self.input_height, self.input_width, self.mesh_level,
            grid_convention=self.grid_convention,
            node_feat_unit=self.node_feat_unit,
        )
        N, V = g2m.n_src, g2m.n_dst
        grid = x.reshape(B, N, Cin)
        # Static graph features are fp32 numpy; cast to the compute dtype so
        # bf16 rollouts don't promote back to fp32 (scan carry must be stable).
        cdt = x.dtype
        mesh_nf = jnp.broadcast_to(
            jnp.asarray(mesh_nfeat0, dtype=cdt), (B, V, 3)
        )
        g2m_e = jnp.broadcast_to(
            jnp.asarray(g2m.edge_feat, dtype=cdt), (B, *g2m.edge_feat.shape)
        )
        mesh_e = jnp.broadcast_to(
            jnp.asarray(mesh_g.edge_feat, dtype=cdt), (B, *mesh_g.edge_feat.shape)
        )
        m2g_e = jnp.broadcast_to(
            jnp.asarray(m2g.edge_feat, dtype=cdt), (B, *m2g.edge_feat.shape)
        )

        mlp = lambda: MeshGraphMLP(D, D, hl)

        if self.spmd_mesh is not None:
            # Fully-partitioned step (reference keeps the WHOLE rollout
            # partitioned: partitioned g2m scatter in prepare_inputs, m2g
            # gather in prepare_output, node features sharded across scan
            # steps — `graph_cast_net.py:113-133,669-736`).  Grid nodes are
            # sharded in row-major H*W chunks (== sharding H over the
            # device axis), mesh nodes in id chunks; every MLP runs on the
            # node-/edge-sharded arrays via GSPMD, and the only
            # communication is one all_to_all of boundary src features per
            # edge_ends.  Module ORDER matches the single-device branch ->
            # identical parameter trees, same checkpoints run either way.
            if self.aggregation != "sum":
                raise NotImplementedError(
                    "partitioned GraphCast supports aggregation='sum' only"
                )
            from dlwpbench_tpu.parallel.graphcast_dist import make_graph_ops

            g2m_ops = make_graph_ops(
                self.spmd_mesh, g2m.src, g2m.dst, V, self.dist_axis, n_src=N
            )
            proc_ops = make_graph_ops(
                self.spmd_mesh, mesh_g.src, mesh_g.dst, V, self.dist_axis,
                n_src=V,
            )
            m2g_ops = make_graph_ops(
                self.spmd_mesh, m2g.src, m2g.dst, N, self.dist_axis, n_src=V
            )
            NP = m2g_ops.plan.n_nodes_padded  # padded grid nodes (P*chunk)
            VP = proc_ops.plan.n_nodes_padded  # padded mesh nodes

            grid = jnp.pad(grid, [(0, 0), (0, NP - N), (0, 0)])
            mesh_nf = jnp.pad(mesh_nf, [(0, 0), (0, VP - V), (0, 0)])
            g2m_e = jnp.take(g2m_e, jnp.asarray(g2m_ops.plan.e_perm), axis=1)
            mesh_e = jnp.take(mesh_e, jnp.asarray(proc_ops.plan.e_perm), axis=1)
            m2g_e = jnp.take(m2g_e, jnp.asarray(m2g_ops.plan.e_perm), axis=1)

            # encoder embedder (4 MLPs), rowwise on sharded arrays
            grid = mlp()(grid)
            mesh_nf = mlp()(mesh_nf)
            g2m_e = mlp()(g2m_e)
            mesh_e = mlp()(mesh_e)

            # g2m encoder: one all_to_all moves boundary grid features
            src_f, dst_f = g2m_ops.edge_ends(grid, mesh_nf)
            g2m_e = mlp()(jnp.concatenate([g2m_e, src_f, dst_f], -1))
            agg = g2m_ops.aggregate(g2m_e)
            mesh_nf = mesh_nf + mlp()(jnp.concatenate([agg, mesh_nf], -1))
            grid = grid + mlp()(grid)

            # processor trunk over the sharded multimesh
            for _ in range(self.processor_layers):
                src_f, dst_f = proc_ops.edge_ends(mesh_nf, mesh_nf)
                mesh_e = MeshEdgeBlock(D, D, hl)(
                    mesh_e, src_f, dst_f, None, None, pregathered=True
                )
                agg = proc_ops.aggregate(mesh_e)
                mesh_nf = MeshNodeBlock(D, D, hl, self.aggregation)(
                    agg, mesh_nf, None, None, preaggregated=True
                )

            # m2g decoder: output grid features land sharded
            m2g_e = mlp()(m2g_e)
            src_f, dst_f = m2g_ops.edge_ends(mesh_nf, grid)
            m2g_e = mlp()(jnp.concatenate([m2g_e, src_f, dst_f], -1))
            agg = m2g_ops.aggregate(m2g_e)
            grid = grid + mlp()(jnp.concatenate([agg, grid], -1))

            out = MeshGraphMLP(self.prognostic_channels, D, hl, norm=False)(
                grid
            )[:, :N]
            return out.reshape(B, H, W, self.prognostic_channels), state

        # Movement operators: one-hot MXU contractions on TPU for graphs
        # this small, take/segment_sum elsewhere (`ops/graph_ops.py`).
        g2m_mv = EdgeMovement(g2m.src, g2m.dst, N, V, self.movement_impl)
        proc_mv = EdgeMovement(
            mesh_g.src, mesh_g.dst, V, V, self.movement_impl
        )
        m2g_mv = EdgeMovement(m2g.src, m2g.dst, V, N, self.movement_impl)

        # --- encoder embedder (4 MLPs) ---
        grid = mlp()(grid)
        mesh_nf = mlp()(mesh_nf)
        g2m_e = mlp()(g2m_e)
        mesh_e = mlp()(mesh_e)

        # --- g2m encoder ---
        cat = jnp.concatenate(
            [g2m_e, g2m_mv.gather_src(grid), g2m_mv.gather_dst(mesh_nf)],
            axis=-1,
        )
        g2m_e = mlp()(cat)
        agg = g2m_mv.aggregate(g2m_e, self.aggregation)
        mesh_nf = mesh_nf + mlp()(jnp.concatenate([agg, mesh_nf], -1))
        grid = grid + mlp()(grid)

        # --- processor over the multimesh ---
        for _ in range(self.processor_layers):
            mesh_e = MeshEdgeBlock(D, D, hl)(
                mesh_e, mesh_nf, mesh_nf, movement=proc_mv
            )
            mesh_nf = MeshNodeBlock(D, D, hl, self.aggregation)(
                mesh_e, mesh_nf, movement=proc_mv
            )

        # --- m2g decoder ---
        m2g_e = mlp()(m2g_e)
        cat = jnp.concatenate(
            [m2g_e, m2g_mv.gather_src(mesh_nf), m2g_mv.gather_dst(grid)],
            axis=-1,
        )
        m2g_e = mlp()(cat)
        agg = m2g_mv.aggregate(m2g_e, self.aggregation)
        grid = grid + mlp()(jnp.concatenate([agg, grid], -1))

        # final MLP, no norm (`graph_cast_net.py:363-371`)
        out = MeshGraphMLP(self.prognostic_channels, D, hl, norm=False)(grid)
        return out.reshape(B, H, W, self.prognostic_channels), state
