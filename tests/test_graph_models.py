"""Graph family tests: icosphere, graph builders, GraphCast, MeshGraphNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestIcosphere:
    @pytest.mark.parametrize("order,nv", [(0, 12), (1, 42), (2, 162)])
    def test_vertex_counts(self, order, nv):
        from dlwpbench_tpu.grids.icosphere import icospheres

        ico = icospheres(order)
        assert ico[f"order_{order}_vertices"].shape == (nv, 3)
        assert ico[f"order_{order}_faces"].shape == (20 * 4**order, 3)
        # unit sphere
        np.testing.assert_allclose(
            np.linalg.norm(ico[f"order_{order}_vertices"], axis=1), 1.0, atol=1e-12
        )

    def test_vertex_prefix_property(self):
        from dlwpbench_tpu.grids.icosphere import icospheres

        ico = icospheres(2)
        np.testing.assert_array_equal(
            ico["order_1_vertices"], ico["order_2_vertices"][:42]
        )


class TestGraphBuilders:
    def test_graphcast_graphs(self):
        from dlwpbench_tpu.grids.mesh_graph import build_graphcast_graphs

        mg, g2m, m2g, mnf, verts, gll = build_graphcast_graphs(16, 32, 2)
        N, V = 16 * 32, 162
        assert mg.n_src == V and g2m.n_src == N and m2g.n_dst == N
        # m2g: every grid point receives from exactly 3 mesh vertices
        assert m2g.src.shape[0] == 3 * N
        # every grid point has at least one g2m edge partner set nonempty
        assert g2m.src.shape[0] > 0
        # edge features normalized: max norm == 1
        assert abs(mg.edge_feat[:, 3].max() - 1.0) < 1e-6
        # node features in [-1, 1]
        assert np.abs(mnf).max() <= 1.0 + 1e-6

    def test_mesh_degree(self):
        """Multimesh: order-0 vertices keep coarse edges (multiscale)."""
        from dlwpbench_tpu.grids.mesh_graph import build_graphcast_graphs

        mg, *_ = build_graphcast_graphs(16, 32, 2)
        deg = np.bincount(np.asarray(mg.src), minlength=mg.n_src)
        # original 12 icosahedron vertices participate in all 3 mesh levels
        assert deg[:12].min() > deg[42:].max()

    def test_grid_graphs(self):
        from dlwpbench_tpu.models.mgn import build_grid_graph

        src, dst, ef = build_grid_graph(8, 16, "grid_2d")
        deg = np.bincount(src, minlength=8 * 16)
        assert deg.min() == 3 and deg.max() == 4  # poles miss one lat edge
        # periodic lon: wrap edges have |dc| == 1 after correction
        assert np.abs(ef).max() <= 1.0

        src8, _, ef8 = build_grid_graph(8, 16, "grid_2d_8stencil")
        assert ef8.shape[1] == 3 and src8.shape[0] > src.shape[0]

        srcd, dstd, efd = build_grid_graph(8, 16, "delaunay")
        assert efd.shape[1] == 2
        # seam closed: there are edges between col 0 and col W-1
        uc, vc = srcd % 16, dstd % 16
        assert ((uc == 0) & (vc == 15)).any()


class TestSegmentAggregation:
    def test_sum_and_mean(self):
        from dlwpbench_tpu.ops.graph_ops import aggregate

        e = jnp.asarray([[1.0], [2.0], [4.0]])
        dst = jnp.asarray([0, 0, 2])
        s = np.asarray(aggregate(e, dst, 3, "sum"))
        np.testing.assert_allclose(s, [[3.0], [0.0], [4.0]])
        m = np.asarray(aggregate(e, dst, 3, "mean"))
        np.testing.assert_allclose(m, [[1.5], [0.0], [4.0]])

    def test_batched(self):
        from dlwpbench_tpu.ops.graph_ops import aggregate

        e = jnp.ones((2, 4, 3))
        dst = jnp.asarray([0, 1, 1, 1])
        out = np.asarray(aggregate(e, dst, 2))
        np.testing.assert_allclose(out[:, 0], 1.0)
        np.testing.assert_allclose(out[:, 1], 3.0)


class TestGraphModels:
    def test_graphcast(self):
        from dlwpbench_tpu.models.graphcast import GraphCastNet

        m = GraphCastNet(
            input_height=16,
            input_width=32,
            constant_channels=2,
            prescribed_channels=1,
            prognostic_channels=3,
            mesh_level=1,
            processor_layers=2,
            hidden_dim=16,
        )
        r = np.random.default_rng(0)
        const = jnp.asarray(r.standard_normal((2, 1, 2, 16, 32)), jnp.float32)
        pres = jnp.asarray(r.standard_normal((2, 3, 1, 16, 32)), jnp.float32)
        prog = jnp.asarray(r.standard_normal((2, 3, 3, 16, 32)), jnp.float32)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), const, pres, prog)
        out = jax.jit(m.apply)(p, const, pres, prog)
        assert out.shape == (2, 2, 3, 16, 32)  # batch > 1 supported (ref: b=1 only)
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.parametrize("gtype", ["grid_2d", "grid_2d_8stencil", "delaunay"])
    def test_mgn(self, gtype):
        from dlwpbench_tpu.models.mgn import MeshGraphNet

        m = MeshGraphNet(
            constant_channels=1,
            prescribed_channels=0,
            prognostic_channels=2,
            processor_size=2,
            hidden_dim_processor=8,
            hidden_dim_node_encoder=8,
            hidden_dim_edge_encoder=8,
            hidden_dim_node_decoder=8,
            graph_type=gtype,
        )
        r = np.random.default_rng(0)
        const = jnp.asarray(r.standard_normal((1, 1, 1, 8, 16)), jnp.float32)
        prog = jnp.asarray(r.standard_normal((1, 3, 2, 8, 16)), jnp.float32)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), const, None, prog)
        out = jax.jit(lambda pp, c, g: m.apply(pp, c, None, g))(p, const, prog)
        assert out.shape == (1, 2, 2, 8, 16)
        assert np.isfinite(np.asarray(out)).all()


class TestMovementImplementations:
    """The three edge-movement implementations (`ops/graph_ops.py`) must be
    mathematically identical: one-hot MXU contraction == gather/segment_sum,
    and MGN's stencil (roll/shifted-add) form == its edge-list form."""

    def test_onehot_matches_gather(self):
        from dlwpbench_tpu.ops.graph_ops import aggregate, gather_nodes

        r = np.random.default_rng(3)
        E, N, F, B = 57, 13, 6, 2
        src = r.integers(0, N, E).astype(np.int32)
        dst = r.integers(0, N, E).astype(np.int32)
        ef = jnp.asarray(r.standard_normal((B, E, F)), jnp.float32)
        nf = jnp.asarray(r.standard_normal((B, N, F)), jnp.float32)
        for mode in ("sum", "mean"):
            a = aggregate(ef, dst, N, mode, impl="gather")
            b = aggregate(ef, dst, N, mode, impl="onehot")
            # onehot rides the MXU in bf16 (activations round once)
            np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2)
        g1 = gather_nodes(nf, src, N, impl="gather")
        g2 = gather_nodes(nf, src, N, impl="onehot")
        np.testing.assert_allclose(g1, g2, atol=2e-2, rtol=2e-2)

    def test_onehot_grads_match(self):
        from dlwpbench_tpu.ops.graph_ops import aggregate

        r = np.random.default_rng(4)
        E, N, F = 31, 7, 4
        dst = r.integers(0, N, E).astype(np.int32)
        ef = jnp.asarray(r.standard_normal((E, F)), jnp.float32)
        g1 = jax.grad(lambda e: jnp.sum(aggregate(e, dst, N, impl="gather") ** 2))(ef)
        g2 = jax.grad(lambda e: jnp.sum(aggregate(e, dst, N, impl="onehot") ** 2))(ef)
        np.testing.assert_allclose(g1, g2, atol=5e-2, rtol=5e-2)

    @pytest.mark.parametrize("gt", ["grid_2d", "grid_2d_8stencil"])
    def test_mgn_stencil_matches_edge_list(self, gt):
        from dlwpbench_tpu.models.mgn import MeshGraphNet

        r = np.random.default_rng(5)
        m1 = MeshGraphNet(
            graph_type=gt, processor_size=2, hidden_dim_processor=16,
            hidden_dim_node_encoder=16, hidden_dim_edge_encoder=16,
            hidden_dim_node_decoder=16, constant_channels=2,
            prescribed_channels=0, prognostic_channels=1,
            movement_impl="edge_list",
        )
        m2 = m1.clone(movement_impl="auto")
        B, T, H, W = 2, 3, 8, 16
        const = jnp.asarray(r.standard_normal((B, 1, 2, H, W)), jnp.float32)
        prog = jnp.asarray(r.standard_normal((B, T, 1, H, W)), jnp.float32)
        p1 = m1.init(jax.random.PRNGKey(0), const, None, prog)
        p2 = m2.init(jax.random.PRNGKey(0), const, None, prog)
        # identical parameter trees: checkpoints are impl-portable
        assert jax.tree.structure(p1) == jax.tree.structure(p2)
        assert [a.shape for a in jax.tree.leaves(p1)] == [
            a.shape for a in jax.tree.leaves(p2)
        ]
        o1 = m1.apply(p1, const, None, prog)
        o2 = m2.apply(p1, const, None, prog)
        np.testing.assert_allclose(o1, o2, atol=2e-2, rtol=2e-2)

    def test_mgn_stencil_mean_aggregation(self):
        from dlwpbench_tpu.models.mgn import MeshGraphNet

        r = np.random.default_rng(6)
        kw = dict(
            graph_type="grid_2d", processor_size=1, hidden_dim_processor=8,
            hidden_dim_node_encoder=8, hidden_dim_edge_encoder=8,
            hidden_dim_node_decoder=8, constant_channels=1,
            prescribed_channels=0, prognostic_channels=1, aggregation="mean",
        )
        m1 = MeshGraphNet(movement_impl="edge_list", **kw)
        m2 = MeshGraphNet(movement_impl="auto", **kw)
        const = jnp.asarray(r.standard_normal((1, 1, 1, 4, 8)), jnp.float32)
        prog = jnp.asarray(r.standard_normal((1, 2, 1, 4, 8)), jnp.float32)
        p = m1.init(jax.random.PRNGKey(1), const, None, prog)
        o1 = m1.apply(p, const, None, prog)
        o2 = m2.apply(p, const, None, prog)
        np.testing.assert_allclose(o1, o2, atol=1e-4, rtol=1e-4)

    def test_graphcast_onehot_matches_gather(self):
        from dlwpbench_tpu.models.graphcast import GraphCastNet

        r = np.random.default_rng(7)
        gc1 = GraphCastNet(
            input_height=8, input_width=16, mesh_level=1, processor_layers=2,
            hidden_dim=16, constant_channels=2, prescribed_channels=0,
            prognostic_channels=1, movement_impl="gather",
        )
        gc2 = gc1.clone(movement_impl="onehot")
        const = jnp.asarray(r.standard_normal((1, 1, 2, 8, 16)), jnp.float32)
        prog = jnp.asarray(r.standard_normal((1, 3, 1, 8, 16)), jnp.float32)
        p = gc1.init(jax.random.PRNGKey(0), const, None, prog)
        o1 = gc1.apply(p, const, None, prog)
        o2 = gc2.apply(p, const, None, prog)
        np.testing.assert_allclose(o1, o2, atol=5e-2, rtol=5e-2)
