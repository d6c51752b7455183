"""Weight-copy parity for the GraphCast/MeshGraphNet GNN building blocks
against the reference's pure-torch modules (`models/graphcast/gnn_layers/`).

DGL is not installable in this image, but the reference's MLP/edge-block/
node-block math is plain torch: only the feature *routing* goes through a
DGLGraph (``apply_edges``/``update_all``).  A ~60-line fake graph speaking
that exact API over explicit (src, dst) index vectors makes the reference
modules executable, so every learned transformation can be weight-copied
into our `ops/graph_ops.py` blocks and compared:

- MeshGraphMLP (`mesh_graph_mlp.py:103-196`)
- MeshEdgeBlock, concat variant (`mesh_edge_block.py:30-94` via
  `MeshGraphEdgeMLPConcat`, `mesh_graph_mlp.py:197-266`)
- MeshEdgeBlock, concat-trick variant (`MeshGraphEdgeMLPSum`,
  `mesh_graph_mlp.py:267-445`: split first-layer weights + indexed sum)
- MeshNodeBlock sum/mean aggregation (`mesh_node_block.py:30-93`,
  `agg_concat_dgl` `gnn_layers/utils.py:340-376`)

This closes the GraphCast/MGN gap in the parity matrix down to exactly the
DGL C++ kernels themselves (which carry no learned weights).
"""

from __future__ import annotations

import contextlib
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/src/dlwpbench"
GNN = os.path.join(REF, "models", "graphcast", "gnn_layers")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GNN), reason="reference checkout not mounted"
)


# ---------------------------------------------------------------------------
# reference loading: dgl stub + synthetic package chain
# ---------------------------------------------------------------------------


def _load_gnn_modules():
    """Import the reference gnn_layers modules with a minimal dgl stub."""
    try:
        import importlib.util

        import torch

        if "dgl" not in sys.modules:
            dgl = types.ModuleType("dgl")
            dgl.__path__ = []

            class DGLGraph:  # only referenced in type annotations
                pass

            dgl.DGLGraph = DGLGraph
            fn = types.ModuleType("dgl.function")
            # marker tuples interpreted by FakeGraph.update_all
            fn.copy_e = lambda src, out: ("copy_e", src, out)
            fn.sum = lambda m, out: ("sum", m, out)
            fn.mean = lambda m, out: ("mean", m, out)
            dgl.function = fn
            sys.modules["dgl"] = dgl
            sys.modules["dgl.function"] = fn

        # synthetic package chain so `from models.graphcast.gnn_layers
        # import CuGraphCSC` resolves without executing the package
        # __init__ trees (they drag in DGL/distributed machinery).
        # synthetic packages with REAL search paths: submodules import
        # through the normal machinery, but the heavy package __init__s
        # (which drag in DGL/distributed chains) never execute.
        for pkg, path in (
            ("models", os.path.join(REF, "models")),
            ("models.graphcast", os.path.join(REF, "models", "graphcast")),
            ("models.graphcast.gnn_layers", GNN),
        ):
            if pkg not in sys.modules:
                m = types.ModuleType(pkg)
                m.__path__ = [path]
                sys.modules[pkg] = m
        pkg = sys.modules["models.graphcast.gnn_layers"]
        if not hasattr(pkg, "CuGraphCSC"):

            class _CuGraphCSC:  # isinstance() target only
                pass

            class _DistributedGraph:
                pass

            pkg.CuGraphCSC = _CuGraphCSC
            pkg.DistributedGraph = _DistributedGraph

        def load(modname: str):
            full = "models.graphcast.gnn_layers." + modname
            if full in sys.modules:
                return sys.modules[full]
            spec = importlib.util.spec_from_file_location(
                full, os.path.join(GNN, modname + ".py")
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[full] = mod
            spec.loader.exec_module(mod)
            setattr(pkg, modname, mod)
            return mod

        utils = load("utils")
        mlp = load("mesh_graph_mlp")
        eb = load("mesh_edge_block")
        nb = load("mesh_node_block")
        return utils, mlp, eb, nb
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference gnn_layers import failed: {e}")


class FakeGraph:
    """Minimal DGLGraph lookalike over explicit (src, dst) index vectors.

    Implements exactly the API surface the reference blocks touch:
    ``edges()``, ``local_scope()``, ``ndata/edata/srcdata/dstdata``,
    ``apply_edges(func)`` and ``update_all(copy_e, sum|mean)``.
    """

    def __init__(self, src, dst, n_src, n_dst):
        import torch

        self._src = torch.as_tensor(np.asarray(src), dtype=torch.int64)
        self._dst = torch.as_tensor(np.asarray(dst), dtype=torch.int64)
        self.n_src, self.n_dst = n_src, n_dst
        self.ndata, self.edata = {}, {}
        self.srcdata, self.dstdata = {}, {}

    def edges(self):
        return self._src, self._dst

    def num_nodes(self):
        return self.n_dst

    def num_edges(self):
        return int(self._src.shape[0])

    def to(self, device=None, **kwargs):
        return self

    batch_size = 1

    @contextlib.contextmanager
    def local_scope(self):
        saved = [
            (d, dict(d))
            for d in (self.ndata, self.edata, self.srcdata, self.dstdata)
        ]
        try:
            yield self
        finally:
            for d, snap in saved:
                d.clear()
                d.update(snap)

    def apply_edges(self, func):
        if self.srcdata or self.dstdata:  # bipartite storage
            src_store = {k: v[self._src] for k, v in self.srcdata.items()}
            dst_store = {k: v[self._dst] for k, v in self.dstdata.items()}
        else:  # homogeneous: srcdata/dstdata alias ndata in DGL
            src_store = {k: v[self._src] for k, v in self.ndata.items()}
            dst_store = {k: v[self._dst] for k, v in self.ndata.items()}
        edges = types.SimpleNamespace(
            data=self.edata, src=src_store, dst=dst_store
        )
        self.edata.update(func(edges))

    def update_all(self, msg, red):
        import torch

        assert msg[0] == "copy_e", msg
        e = self.edata[msg[1]]
        out = torch.zeros(self.n_dst, e.shape[-1], dtype=e.dtype)
        out.index_add_(0, self._dst, e)
        if red[0] == "mean":
            cnt = torch.zeros(self.n_dst, 1, dtype=e.dtype)
            cnt.index_add_(0, self._dst, torch.ones(e.shape[0], 1, dtype=e.dtype))
            out = out / cnt.clamp(min=1.0)
        else:
            assert red[0] == "sum", red
        self.dstdata[red[2]] = out


def _install_dgl_graph_builders():
    """Extend the dgl stub with the graph constructors MeshGraphNet uses
    (`meshgraphnet.py:228,244`): from_networkx / to_bidirected / batch."""
    dgl = sys.modules["dgl"]
    if hasattr(dgl, "from_networkx"):
        return

    def _from_edge_set(edge_set, n_nodes):
        edges = sorted(edge_set)
        src = np.array([e[0] for e in edges], dtype=np.int64)
        dst = np.array([e[1] for e in edges], dtype=np.int64)
        return FakeGraph(src, dst, n_nodes, n_nodes)

    def from_networkx(nxg):
        nodes = list(nxg.nodes())
        idx = {n: i for i, n in enumerate(nodes)}
        edge_set = set()
        for u, v in nxg.edges():
            edge_set.add((idx[u], idx[v]))
            edge_set.add((idx[v], idx[u]))
        return _from_edge_set(edge_set, len(nodes))

    def to_bidirected(g):
        src, dst = g.edges()
        edge_set = set()
        for u, v in zip(src.tolist(), dst.tolist()):
            if u != v:
                edge_set.add((u, v))
                edge_set.add((v, u))
        return _from_edge_set(edge_set, g.num_nodes())

    def batch(graphs):
        import torch

        srcs, dsts, off = [], [], 0
        for g in graphs:
            s, d = g.edges()
            srcs.append(s + off)
            dsts.append(d + off)
            off += g.num_nodes()
        out = FakeGraph(
            torch.cat(srcs).numpy(), torch.cat(dsts).numpy(), off, off
        )
        out.batch_size = len(graphs)
        return out

    dgl.from_networkx = from_networkx
    dgl.to_bidirected = to_bidirected
    dgl.batch = batch

    def graph(edges, idtype=None):
        src, dst = edges
        src = np.asarray(src)
        dst = np.asarray(dst)
        n = int(max(src.max(), dst.max())) + 1
        return _from_edge_set(set(zip(src.tolist(), dst.tolist())), n)

    def heterograph(spec, idtype=None):
        ((src_type, _etype, dst_type), (fmt, (src, dst))) = next(
            iter(spec.items())
        )
        assert fmt == "coo"
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        return FakeHeteroGraph(
            src, dst, src_type, dst_type,
            int(src.max()) + 1, int(dst.max()) + 1,
        )

    dgl.graph = graph
    dgl.heterograph = heterograph
    dgl.add_self_loop = lambda g: (_ for _ in ()).throw(
        NotImplementedError("add_self_loop not needed")
    )


def _install_modulus_utils_pkg():
    """Stubs + package chain for `models.graphcast.utils.*` (Module base,
    registry, filesystem) used by the MGN/GraphCast model classes."""
    if "s3fs" not in sys.modules:  # filesystem.py imports it at top level
        try:
            import s3fs  # noqa: F401
        except ImportError:
            m = types.ModuleType("s3fs")
            m.S3FileSystem = object
            sys.modules["s3fs"] = m
    if "pkg_resources" not in sys.modules:  # registry.py (setuptools>=81)
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            m = types.ModuleType("pkg_resources")
            m.iter_entry_points = lambda *a, **k: []
            sys.modules["pkg_resources"] = m
    # real __path__ so `models.graphcast.utils.{meta,module,...}` import
    # through the normal machinery without executing heavier __init__s
    upkg = "models.graphcast.utils"
    if upkg not in sys.modules:
        m = types.ModuleType(upkg)
        m.__path__ = [os.path.join(REF, "models", "graphcast", "utils")]
        sys.modules[upkg] = m


def _load_ref_graphcast():
    """Load the reference GraphCastNet (`models/graphcast/graph_cast_net.py`)
    on the fake-DGL builders (incl. heterographs for g2m/m2g)."""
    _load_gnn_modules()
    _install_dgl_graph_builders()
    try:
        import importlib

        _install_modulus_utils_pkg()
        return importlib.import_module("models.graphcast.graph_cast_net")
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference GraphCastNet import failed: {e}")


def _load_ref_meshgraphnet():
    """Load the reference MeshGraphNet (`models/mgn/meshgraphnet.py`) on the
    fake-DGL graph builders + the Modulus utils package chain."""
    _load_gnn_modules()
    _install_dgl_graph_builders()
    try:
        import importlib.util

        _install_modulus_utils_pkg()
        full = "models.mgn.meshgraphnet"
        if full in sys.modules:
            return sys.modules[full]
        fp = os.path.join(REF, "models", "mgn", "meshgraphnet.py")
        spec = importlib.util.spec_from_file_location(full, fp)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        try:
            spec.loader.exec_module(mod)
        except BaseException:
            del sys.modules[full]  # don't cache a half-executed module
            raise
        return mod
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference MeshGraphNet import failed: {e}")


class _SizedDict(dict):
    """srcdata/dstdata store that updates the owning graph's node count on
    feature assignment (DGL infers bipartite node counts from features)."""

    def __init__(self, owner, attr):
        super().__init__()
        self._owner, self._attr = owner, attr

    def __setitem__(self, key, val):
        super().__setitem__(key, val)
        setattr(self._owner, self._attr, len(val))


class _NTypeView:
    """`graph.ndata[key][ntype]` read/write view for the fake heterograph."""

    def __init__(self, g, key):
        self._g, self._key = g, key

    def _store(self, ntype):
        g = self._g
        if ntype == g.src_type:
            return g.srcdata
        assert ntype == g.dst_type, ntype
        return g.dstdata

    def __getitem__(self, ntype):
        return self._store(ntype)[self._key]

    def __setitem__(self, ntype, val):
        self._store(ntype)[self._key] = val


class _HeteroNData:
    def __init__(self, g):
        self._g = g

    def __getitem__(self, key):
        return _NTypeView(self._g, key)


class FakeHeteroGraph(FakeGraph):
    """Bipartite (src_type, etype, dst_type) FakeGraph — `dgl.heterograph`."""

    def __init__(self, src, dst, src_type, dst_type, n_src, n_dst):
        super().__init__(src, dst, n_src, n_dst)
        self.src_type, self.dst_type = src_type, dst_type
        self.srcdata = _SizedDict(self, "n_src")
        self.dstdata = _SizedDict(self, "n_dst")
        self.ndata = _HeteroNData(self)

    @contextlib.contextmanager
    def local_scope(self):
        saved = [
            (d, dict(d)) for d in (self.edata, self.srcdata, self.dstdata)
        ]
        try:
            yield self
        finally:
            for d, snap in saved:
                d.clear()
                d.update(snap)


def _rand_graph(rng, n_src=14, n_dst=11, n_edges=40):
    src = rng.integers(0, n_src, size=n_edges)
    dst = rng.integers(0, n_dst, size=n_edges)
    # every dst node receives >=1 edge so mean-aggregation is well-defined
    dst[:n_dst] = np.arange(n_dst)
    return src, dst


# ---------------------------------------------------------------------------
# weight-copy helpers (torch Sequential -> flax MeshGraphMLP params)
# ---------------------------------------------------------------------------


def _copy_mlp_params(seq_layers):
    """Map the reference MLP's [Linear, act, ..., Linear, LayerNorm?] to our
    flax MeshGraphMLP param dict ({Dense_i}, {LayerNorm_0})."""
    import torch

    params = {}
    d = 0
    for layer in seq_layers:
        if isinstance(layer, torch.nn.Linear):
            params[f"Dense_{d}"] = {
                "kernel": layer.weight.detach().numpy().T,
                "bias": layer.bias.detach().numpy(),
            }
            d += 1
        elif isinstance(layer, torch.nn.LayerNorm):
            params["LayerNorm_0"] = {
                "scale": layer.weight.detach().numpy(),
                "bias": layer.bias.detach().numpy(),
            }
    return params


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


class TestGNNBlockParity:
    @pytest.mark.parametrize("hidden_layers", [1, 2])
    def test_mesh_graph_mlp(self, hidden_layers):
        import jax.numpy as jnp
        import torch

        from dlwpbench_tpu.ops.graph_ops import MeshGraphMLP

        _, mlp_mod, _, _ = _load_gnn_modules()
        torch.manual_seed(0)
        ref = mlp_mod.MeshGraphMLP(
            input_dim=9, output_dim=13, hidden_dim=24,
            hidden_layers=hidden_layers,
        ).eval()

        x = np.random.default_rng(1).standard_normal((37, 9)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.as_tensor(x)).numpy()

        ours = MeshGraphMLP(13, 24, hidden_layers)
        params = {"params": _copy_mlp_params(ref.model)}
        got = np.asarray(ours.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("hidden_layers", [1, 2])
    def test_mesh_edge_block_concat(self, hidden_layers):
        import jax.numpy as jnp
        import torch

        from dlwpbench_tpu.ops.graph_ops import MeshEdgeBlock

        _, _, eb_mod, _ = _load_gnn_modules()
        rng = np.random.default_rng(2)
        n, e_dim, n_dim, hid = 14, 16, 7, 24
        src, dst = _rand_graph(rng, n_src=n, n_dst=n)
        g = FakeGraph(src, dst, n, n)

        torch.manual_seed(1)
        ref = eb_mod.MeshEdgeBlock(
            input_dim_nodes=n_dim, input_dim_edges=e_dim, output_dim=e_dim,
            hidden_dim=hid, hidden_layers=hidden_layers,
            do_concat_trick=False,
        ).eval()

        efeat = rng.standard_normal((len(src), e_dim)).astype(np.float32)
        nfeat = rng.standard_normal((n, n_dim)).astype(np.float32)
        with torch.no_grad():
            want, _ = ref(torch.as_tensor(efeat), torch.as_tensor(nfeat), g)

        ours = MeshEdgeBlock(e_dim, hid, hidden_layers)
        params = {
            "params": {"MeshGraphMLP_0": _copy_mlp_params(ref.edge_mlp.model)}
        }
        got = ours.apply(
            params, jnp.asarray(efeat), jnp.asarray(nfeat), jnp.asarray(nfeat),
            jnp.asarray(src), jnp.asarray(dst),
        )
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5
        )

    def test_mesh_edge_block_concat_trick(self):
        """The concat-trick variant (split first-layer weights + per-edge
        indexed sum, `mesh_graph_mlp.py:267-445`) must equal our fused
        concat formulation once the split weights are re-concatenated."""
        import jax.numpy as jnp
        import torch

        from dlwpbench_tpu.ops.graph_ops import MeshEdgeBlock

        _, _, eb_mod, _ = _load_gnn_modules()
        rng = np.random.default_rng(3)
        n, e_dim, n_dim, hid, hl = 14, 16, 7, 24, 2
        src, dst = _rand_graph(rng, n_src=n, n_dst=n)
        g = FakeGraph(src, dst, n, n)

        torch.manual_seed(2)
        ref = eb_mod.MeshEdgeBlock(
            input_dim_nodes=n_dim, input_dim_edges=e_dim, output_dim=e_dim,
            hidden_dim=hid, hidden_layers=hl, do_concat_trick=True,
        ).eval()

        efeat = rng.standard_normal((len(src), e_dim)).astype(np.float32)
        nfeat = rng.standard_normal((n, n_dim)).astype(np.float32)
        with torch.no_grad():
            want, _ = ref(torch.as_tensor(efeat), torch.as_tensor(nfeat), g)

        m = ref.edge_mlp
        first = {
            "kernel": torch.cat(
                [m.lin_efeat, m.lin_src, m.lin_dst], dim=1
            ).detach().numpy().T,
            "bias": m.bias.detach().numpy(),
        }
        rest = _copy_mlp_params(m.model)  # model = [act, Linear, ..., Norm]
        mlp_params = {"Dense_0": first}
        for i in range(hl):  # shift: our Dense_{i+1} = their model Linear i
            mlp_params[f"Dense_{i + 1}"] = rest[f"Dense_{i}"]
        mlp_params["LayerNorm_0"] = rest["LayerNorm_0"]

        ours = MeshEdgeBlock(e_dim, hid, hl)
        got = ours.apply(
            {"params": {"MeshGraphMLP_0": mlp_params}},
            jnp.asarray(efeat), jnp.asarray(nfeat), jnp.asarray(nfeat),
            jnp.asarray(src), jnp.asarray(dst),
        )
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5
        )

    @pytest.mark.parametrize("aggregation", ["sum", "mean"])
    def test_mesh_node_block(self, aggregation):
        import jax.numpy as jnp
        import torch

        from dlwpbench_tpu.ops.graph_ops import MeshNodeBlock

        _, _, _, nb_mod = _load_gnn_modules()
        rng = np.random.default_rng(4)
        n, e_dim, n_dim, hid = 11, 6, 9, 24
        src, dst = _rand_graph(rng, n_src=n, n_dst=n)
        g = FakeGraph(src, dst, n, n)

        torch.manual_seed(3)
        ref = nb_mod.MeshNodeBlock(
            aggregation=aggregation, input_dim_nodes=n_dim,
            input_dim_edges=e_dim, output_dim=n_dim, hidden_dim=hid,
            hidden_layers=1,
        ).eval()

        efeat = rng.standard_normal((len(src), e_dim)).astype(np.float32)
        nfeat = rng.standard_normal((n, n_dim)).astype(np.float32)
        with torch.no_grad():
            _, want = ref(torch.as_tensor(efeat), torch.as_tensor(nfeat), g)

        ours = MeshNodeBlock(n_dim, hid, 1, aggregation)
        params = {
            "params": {"MeshGraphMLP_0": _copy_mlp_params(ref.node_mlp.model)}
        }
        got = ours.apply(
            params, jnp.asarray(efeat), jnp.asarray(nfeat),
            jnp.asarray(dst), n,
        )
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5
        )

    def test_mesh_edge_block_bipartite(self):
        """g2m/m2g-style bipartite routing (distinct src/dst node sets)."""
        import jax.numpy as jnp
        import torch

        from dlwpbench_tpu.ops.graph_ops import MeshEdgeBlock

        _, _, eb_mod, _ = _load_gnn_modules()
        rng = np.random.default_rng(5)
        n_src_nodes, n_dst_nodes, e_dim, n_dim, hid = 18, 9, 16, 7, 24
        src, dst = _rand_graph(rng, n_src=n_src_nodes, n_dst=n_dst_nodes)
        g = FakeGraph(src, dst, n_src_nodes, n_dst_nodes)

        torch.manual_seed(4)
        ref = eb_mod.MeshEdgeBlock(
            input_dim_nodes=n_dim, input_dim_edges=e_dim, output_dim=e_dim,
            hidden_dim=hid, hidden_layers=1, do_concat_trick=False,
        ).eval()

        efeat = rng.standard_normal((len(src), e_dim)).astype(np.float32)
        sfeat = rng.standard_normal((n_src_nodes, n_dim)).astype(np.float32)
        dfeat = rng.standard_normal((n_dst_nodes, n_dim)).astype(np.float32)
        with torch.no_grad():
            want, _ = ref(
                torch.as_tensor(efeat),
                (torch.as_tensor(sfeat), torch.as_tensor(dfeat)),
                g,
            )

        ours = MeshEdgeBlock(e_dim, hid, 1)
        got = ours.apply(
            {"params": {"MeshGraphMLP_0": _copy_mlp_params(ref.edge_mlp.model)}},
            jnp.asarray(efeat), jnp.asarray(sfeat), jnp.asarray(dfeat),
            jnp.asarray(src), jnp.asarray(dst),
        )
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5
        )


class TestMeshGraphNetFullParity:
    """Full-model weight-copy parity for MeshGraphNet on the grid_2d graph.

    The reference hard-errors without DGL (`meshgraphnet.py:27-34`); the
    fake-DGL graph builders make it executable.  Node ids are row-major
    (networkx grid_2d_graph insertion order == our `row*W + col`), and all
    per-edge quantities are functions of (src, dst), so edge-order
    differences between the two graph builders cannot affect the output
    (edge MLPs are pointwise, aggregation is by destination node).

    Uses H == W: the reference decodes node ids as (u//height, u%width)
    (`meshgraphnet.py:330`), which only matches row-major layout on square
    grids — a fork quirk, recorded here rather than reproduced.
    """

    H = W = 8
    Cc, Cp, Cq = 2, 1, 3

    def _ref_model(self, mgn_mod, processor_size=3, hid=16):
        import torch

        torch.manual_seed(7)
        return mgn_mod.MeshGraphNet(
            constant_channels=self.Cc,
            prescribed_channels=self.Cp,
            prognostic_channels=self.Cq,
            input_dim_edges=2,
            context_size=1,
            processor_size=processor_size,
            message_passing_steps=1,
            hidden_dim_processor=hid,
            hidden_dim_node_encoder=hid,
            hidden_dim_edge_encoder=hid,
            hidden_dim_node_decoder=hid,
            aggregation="sum",
            graph_type="grid_2d",
            device="cpu",
            graph=types.SimpleNamespace(
                height=self.H, width=self.W, periodic=(False, True)
            ),
        ).eval()

    def test_grid_graph_parity(self):
        """Edge set + per-edge features of the reference's dgl/networkx
        pipeline == our `build_grid_graph` (lon-periodic 4-stencil)."""
        from dlwpbench_tpu.models.mgn import build_grid_graph

        mgn_mod = _load_ref_meshgraphnet()
        ref = self._ref_model(mgn_mod)
        rsrc, rdst = (t.numpy() for t in ref.graph.edges())
        ref_feat = ref.edge_features.numpy()

        src, dst, ef = build_grid_graph(self.H, self.W, "grid_2d", True)

        ref_map = {
            (int(s), int(d)): tuple(f)
            for s, d, f in zip(rsrc, rdst, ref_feat)
        }
        our_map = {
            (int(s), int(d)): tuple(f) for s, d, f in zip(src, dst, ef)
        }
        assert set(ref_map) == set(our_map)
        for k in ref_map:
            np.testing.assert_allclose(our_map[k], ref_map[k], atol=0)

    def test_full_rollout_allclose(self):
        import jax
        import jax.numpy as jnp
        import torch

        from dlwpbench_tpu.models.mgn import MeshGraphNet

        mgn_mod = _load_ref_meshgraphnet()
        ref = self._ref_model(mgn_mod)

        B, T = 1, 2  # context 1 -> single closed-loop step (the reference's
        # multi-step branch crashes on a `.to()`-on-list fork defect,
        # `meshgraphnet.py:468-473`, SURVEY 2.9)
        rng = np.random.default_rng(8)
        const = rng.standard_normal((B, 1, self.Cc, self.H, self.W)).astype(
            np.float32
        )
        pres = rng.standard_normal((B, T, self.Cp, self.H, self.W)).astype(
            np.float32
        )
        prog = rng.standard_normal((B, T, self.Cq, self.H, self.W)).astype(
            np.float32
        )
        with torch.no_grad():
            want = ref(
                torch.as_tensor(const), torch.as_tensor(pres),
                torch.as_tensor(prog),
            ).numpy()

        ours = MeshGraphNet(
            constant_channels=self.Cc,
            prescribed_channels=self.Cp,
            prognostic_channels=self.Cq,
            context_size=1,
            processor_size=3,
            hidden_dim_processor=16,
            hidden_dim_node_encoder=16,
            hidden_dim_edge_encoder=16,
            hidden_dim_node_decoder=16,
            graph_type="grid_2d",
            periodic=True,
        )
        params = ours.init(
            jax.random.PRNGKey(0),
            jnp.asarray(const), jnp.asarray(pres), jnp.asarray(prog),
        )
        tree = self._copied_tree(ref, dict(params["params"]))

        got = np.asarray(
            ours.apply(
                {"params": tree},
                jnp.asarray(const), jnp.asarray(pres), jnp.asarray(prog),
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def _copied_tree(self, ref, tree):
        # step() instantiation order: MeshGraphMLP_0 = node encoder,
        # MeshGraphMLP_1 = edge encoder, MeshEdgeBlock_i/MeshNodeBlock_i
        # processor pairs, MeshGraphMLP_2 = decoder (no norm).
        tree["MeshGraphMLP_0"] = _copy_mlp_params(ref.node_encoder.model)
        tree["MeshGraphMLP_1"] = _copy_mlp_params(ref.edge_encoder.model)
        layers = list(ref.processor.processor_layers)
        for i in range(3):
            tree[f"MeshEdgeBlock_{i}"] = {
                "MeshGraphMLP_0": _copy_mlp_params(
                    layers[2 * i].edge_mlp.model
                )
            }
            tree[f"MeshNodeBlock_{i}"] = {
                "MeshGraphMLP_0": _copy_mlp_params(
                    layers[2 * i + 1].node_mlp.model
                )
            }
        tree["MeshGraphMLP_2"] = _copy_mlp_params(ref.node_decoder.model)
        return tree

    def test_multistep_closed_loop(self):
        """4-step closed-loop rollout == chained reference single-steps.

        The reference's own multi-step branch crashes on the
        `.to()`-on-list fork defect (`meshgraphnet.py:468-473`, SURVEY
        2.9), but with context_size=1 the upstream-intent closed loop is
        exactly a chain of its WORKING single-step branch (each step's
        window is just the previous output) — no reference logic needs
        reimplementing."""
        import jax
        import jax.numpy as jnp
        import torch

        from dlwpbench_tpu.models.mgn import MeshGraphNet

        mgn_mod = _load_ref_meshgraphnet()
        ref = self._ref_model(mgn_mod)

        B, T = 1, 5
        rng = np.random.default_rng(9)
        const = rng.standard_normal((B, 1, self.Cc, self.H, self.W)).astype(
            np.float32
        )
        pres = rng.standard_normal((B, T, self.Cp, self.H, self.W)).astype(
            np.float32
        )
        prog = rng.standard_normal((B, T, self.Cq, self.H, self.W)).astype(
            np.float32
        )
        want = _chained_ref_rollout(ref, const, pres, prog)

        ours = MeshGraphNet(
            constant_channels=self.Cc,
            prescribed_channels=self.Cp,
            prognostic_channels=self.Cq,
            context_size=1,
            processor_size=3,
            hidden_dim_processor=16,
            hidden_dim_node_encoder=16,
            hidden_dim_edge_encoder=16,
            hidden_dim_node_decoder=16,
            graph_type="grid_2d",
            periodic=True,
        )
        params = ours.init(
            jax.random.PRNGKey(0),
            jnp.asarray(const), jnp.asarray(pres), jnp.asarray(prog),
        )
        tree = self._copied_tree(ref, dict(params["params"]))
        got = np.asarray(
            ours.apply(
                {"params": tree},
                jnp.asarray(const), jnp.asarray(pres), jnp.asarray(prog),
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def _chained_ref_rollout(ref, const, pres, prog):
    """Multi-step closed-loop oracle from the reference's single-step branch
    (context_size=1): feed each step's output back as the next window."""
    import torch

    T = prog.shape[1]
    cur = torch.as_tensor(prog[:, 0:1])
    outs = []
    with torch.no_grad():
        for t in range(1, T):
            p2 = torch.cat([cur, cur], dim=1)  # slot 1 is unused
            pres2 = torch.as_tensor(pres[:, t - 1 : t + 1])
            out = ref(torch.as_tensor(const), pres2, p2)
            outs.append(out[:, 0])
            cur = out
    return torch.stack(outs, dim=1).numpy()


class TestGraphCastFullParity:
    """Full-model weight-copy parity for GraphCastNet.

    Both sides consume the SAME icosphere geometry: the test writes our
    `grids/icosphere.py` output as the icospheres json the reference's
    `Graph` builder (`utils/graph.py:40-233`) loads (the checkout ships no
    json, and its pymesh generator is uninstallable).  Our graph builder
    runs with `grid_convention="pole_inclusive"` to match the reference's
    linspace(-90, 90) grid (`graph_cast_net.py:189-193`).

    Note the reference's json-schema quirk: `max_order = #faces_keys - 2`
    (`graph.py:81-83`), so a json with orders 0..L+1 yields an order-L
    multimesh.
    """

    H, W, L = 8, 16, 1
    Cc, Cp, Cq = 2, 1, 3
    D, P = 16, 3  # hidden_dim, processor_layers (reference minimum is 3)

    def _write_ico_json(self, tmp_path):
        import json

        from dlwpbench_tpu.grids.icosphere import icospheres

        ico = icospheres(self.L + 1)
        path = os.path.join(str(tmp_path), "icospheres.json")
        with open(path, "w") as f:
            json.dump({k: np.asarray(v).tolist() for k, v in ico.items()}, f)
        return path

    def _ref_model(self, gc_mod, tmp_path):
        import torch

        torch.manual_seed(11)
        return gc_mod.GraphCastNet(
            meshgraph_path=self._write_ico_json(tmp_path),
            input_height=self.H,
            input_width=self.W,
            constant_channels=self.Cc,
            prescribed_channels=self.Cp,
            prognostic_channels=self.Cq,
            context_size=1,
            processor_layers=self.P,
            hidden_layers=1,
            hidden_dim=self.D,
            aggregation="sum",
            activation_fn="silu",
        ).eval()

    def _m2g_tied_grid_points(self, ref, m2g):
        """Grid points whose nearest-face-centroid assignment is an EXACT
        distance tie resolved differently by sklearn (reference) and
        cKDTree (ours).  Returns (tied_dst_set); asserts every mismatch
        really is a tie (equidistant centroids)."""
        from dlwpbench_tpu.grids.icosphere import icospheres
        from dlwpbench_tpu.grids.mesh_graph import (
            build_graphcast_graphs,
            latlon2xyz,
        )

        ico = icospheres(self.L)
        faces = ico[f"order_{self.L}_faces"]
        cents = ico[f"order_{self.L}_face_centroid"]
        face_of = {frozenset(map(int, f)): i for i, f in enumerate(faces)}
        *_, grid_latlon = build_graphcast_graphs(
            self.H, self.W, self.L, grid_convention="pole_inclusive"
        )
        grid_xyz = latlon2xyz(grid_latlon)

        rsrc, rdst = (t.numpy() for t in ref.m2g_graph.edges())
        by_dst_ref, by_dst_ours = {}, {}
        for s, d in zip(rsrc, rdst):
            by_dst_ref.setdefault(int(d), set()).add(int(s))
        from dlwpbench_tpu.grids.mesh_graph import build_graphcast_graphs as b

        _, _, m2g_ours, *_ = b(
            self.H, self.W, self.L, grid_convention="pole_inclusive"
        )
        for s, d in zip(m2g_ours.src, m2g_ours.dst):
            by_dst_ours.setdefault(int(d), set()).add(int(s))

        tied = set()
        for d in by_dst_ref:
            if by_dst_ref[d] != by_dst_ours[d]:
                fr = face_of[frozenset(by_dst_ref[d])]
                fo = face_of[frozenset(by_dst_ours[d])]
                dr = np.linalg.norm(grid_xyz[d] - cents[fr])
                do = np.linalg.norm(grid_xyz[d] - cents[fo])
                np.testing.assert_allclose(dr, do, rtol=0, atol=1e-6)
                tied.add(d)
        return tied

    def test_graph_parity(self, tmp_path):
        """multimesh + g2m + m2g edge sets, edge features, and mesh node
        features match our `build_graphcast_graphs` (m2g modulo exact
        nearest-centroid distance ties, which sklearn and cKDTree break
        differently — every such point is verified to BE a tie)."""
        from dlwpbench_tpu.grids.mesh_graph import build_graphcast_graphs

        gc_mod = _load_ref_graphcast()
        ref = self._ref_model(gc_mod, tmp_path)
        mesh_g, g2m, m2g, mesh_nf, _, _ = build_graphcast_graphs(
            self.H, self.W, self.L, grid_convention="pole_inclusive",
            node_feat_unit="deg_quirk",
        )

        def check(ref_graph, ref_edata, ours, skip_dst=frozenset()):
            rsrc, rdst = (t.numpy() for t in ref_graph.edges())
            ref_map = {
                (int(s), int(d)): f
                for s, d, f in zip(rsrc, rdst, ref_edata.numpy())
                if int(d) not in skip_dst
            }
            our_map = {
                (int(s), int(d)): f
                for s, d, f in zip(ours.src, ours.dst, ours.edge_feat)
                if int(d) not in skip_dst
            }
            assert set(ref_map) == set(our_map)
            for k in ref_map:
                np.testing.assert_allclose(
                    our_map[k], ref_map[k], rtol=1e-4, atol=1e-5
                )

        check(ref.mesh_graph, ref.mesh_edata, mesh_g)
        check(ref.g2m_graph, ref.g2m_edata, g2m)
        tied = self._m2g_tied_grid_points(ref, m2g)
        assert len(tied) <= 4  # a handful of degenerate points at most
        check(ref.m2g_graph, ref.m2g_edata, m2g, skip_dst=tied)
        # deg_quirk features are cos/sin of DEGREE-scale values, so fp32
        # (reference) vs fp64 (ours) rounding is amplified ~57x
        np.testing.assert_allclose(
            mesh_nf, ref.mesh_ndata.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_full_rollout_allclose(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import torch

        from dlwpbench_tpu.models.graphcast import GraphCastNet

        gc_mod = _load_ref_graphcast()
        ref = self._ref_model(gc_mod, tmp_path)

        B, T = 1, 2  # batch must be 1 (`graph_cast_net.py:696-697`); single
        # step — the multi-step branch has the `.to()`-on-list fork defect
        rng = np.random.default_rng(12)
        const = rng.standard_normal((B, 1, self.Cc, self.H, self.W)).astype(
            np.float32
        )
        pres = rng.standard_normal((B, T, self.Cp, self.H, self.W)).astype(
            np.float32
        )
        prog = rng.standard_normal((B, T, self.Cq, self.H, self.W)).astype(
            np.float32
        )
        with torch.no_grad():
            want = ref(
                torch.as_tensor(const), torch.as_tensor(pres),
                torch.as_tensor(prog),
            ).numpy()

        ours = GraphCastNet(
            input_height=self.H,
            input_width=self.W,
            constant_channels=self.Cc,
            prescribed_channels=self.Cp,
            prognostic_channels=self.Cq,
            mesh_level=self.L,
            processor_layers=self.P,
            hidden_layers=1,
            hidden_dim=self.D,
            context_size=1,
            grid_convention="pole_inclusive",
            node_feat_unit="deg_quirk",
        )
        params = ours.init(
            jax.random.PRNGKey(0),
            jnp.asarray(const), jnp.asarray(pres), jnp.asarray(prog),
        )
        tree = self._copied_tree(ref, dict(params["params"]))

        got = np.asarray(
            ours.apply(
                {"params": tree},
                jnp.asarray(const), jnp.asarray(pres), jnp.asarray(prog),
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(
            got[..., self._untied_mask(ref)],
            want[..., self._untied_mask(ref)],
            rtol=1e-4, atol=1e-4,
        )

    def _untied_mask(self, ref):
        """[H, W] bool mask excluding the few grid points whose m2g face
        assignment is an exact nearest-centroid tie broken differently
        (verified ties; m2g only affects the decoder aggregation at
        exactly those dst points)."""
        from dlwpbench_tpu.grids.mesh_graph import build_graphcast_graphs

        _, _, m2g, *_ = build_graphcast_graphs(
            self.H, self.W, self.L, grid_convention="pole_inclusive",
            node_feat_unit="deg_quirk",
        )
        tied = self._m2g_tied_grid_points(ref, m2g)
        mask = np.ones(self.H * self.W, bool)
        mask[list(tied)] = False
        return mask.reshape(self.H, self.W)

    def _copied_tree(self, ref, tree):
        import numpy as np

        # -- grid embedder: the reference assembles channels as
        # [prescribed, prognostic, constants] (`graph_cast_net.py:692-696`),
        # ours as [constants, prescribed, prognostic] — absorb the channel
        # permutation into the first Dense kernel.
        n_pres, n_prog = self.Cp, self.Cq  # context_size == 1
        ours_to_ref = np.concatenate([
            np.arange(n_pres + n_prog, n_pres + n_prog + self.Cc),
            np.arange(0, n_pres),
            np.arange(n_pres, n_pres + n_prog),
        ])
        grid_mlp = _copy_mlp_params(ref.encoder_embedder.grid_node_mlp.model)
        grid_mlp["Dense_0"]["kernel"] = grid_mlp["Dense_0"]["kernel"][
            ours_to_ref
        ]
        # step() instantiation order (models/graphcast.py:163-208):
        tree["MeshGraphMLP_0"] = grid_mlp
        tree["MeshGraphMLP_1"] = _copy_mlp_params(
            ref.encoder_embedder.mesh_node_mlp.model
        )
        tree["MeshGraphMLP_2"] = _copy_mlp_params(
            ref.encoder_embedder.grid2mesh_edge_mlp.model
        )
        tree["MeshGraphMLP_3"] = _copy_mlp_params(
            ref.encoder_embedder.mesh_edge_mlp.model
        )
        tree["MeshGraphMLP_4"] = _copy_mlp_params(ref.encoder.edge_mlp.model)
        tree["MeshGraphMLP_5"] = _copy_mlp_params(
            ref.encoder.dst_node_mlp.model
        )
        tree["MeshGraphMLP_6"] = _copy_mlp_params(
            ref.encoder.src_node_mlp.model
        )
        pairs = (
            list(ref.processor_encoder.processor_layers)
            + list(ref.processor.processor_layers)
            + list(ref.processor_decoder.processor_layers)
        )
        assert len(pairs) == 2 * self.P
        for i in range(self.P):
            tree[f"MeshEdgeBlock_{i}"] = {
                "MeshGraphMLP_0": _copy_mlp_params(
                    pairs[2 * i].edge_mlp.model
                )
            }
            tree[f"MeshNodeBlock_{i}"] = {
                "MeshGraphMLP_0": _copy_mlp_params(
                    pairs[2 * i + 1].node_mlp.model
                )
            }
        tree["MeshGraphMLP_7"] = _copy_mlp_params(
            ref.decoder_embedder.mesh2grid_edge_mlp.model
        )
        tree["MeshGraphMLP_8"] = _copy_mlp_params(ref.decoder.edge_mlp.model)
        tree["MeshGraphMLP_9"] = _copy_mlp_params(ref.decoder.node_mlp.model)
        tree["MeshGraphMLP_10"] = _copy_mlp_params(ref.finale.model)
        return tree

    def test_multistep_closed_loop(self, tmp_path):
        """4-step closed-loop rollout == chained reference single-steps
        (same oracle construction as the MGN multi-step test; the
        reference's own multi-step branch has the `.to()`-on-list fork
        defect, `graph_cast_net.py:640-644`)."""
        import jax
        import jax.numpy as jnp

        from dlwpbench_tpu.models.graphcast import GraphCastNet

        gc_mod = _load_ref_graphcast()
        ref = self._ref_model(gc_mod, tmp_path)

        B, T = 1, 5
        rng = np.random.default_rng(13)
        const = rng.standard_normal((B, 1, self.Cc, self.H, self.W)).astype(
            np.float32
        )
        pres = rng.standard_normal((B, T, self.Cp, self.H, self.W)).astype(
            np.float32
        )
        prog = rng.standard_normal((B, T, self.Cq, self.H, self.W)).astype(
            np.float32
        )
        want = _chained_ref_rollout(ref, const, pres, prog)

        ours = GraphCastNet(
            input_height=self.H,
            input_width=self.W,
            constant_channels=self.Cc,
            prescribed_channels=self.Cp,
            prognostic_channels=self.Cq,
            mesh_level=self.L,
            processor_layers=self.P,
            hidden_layers=1,
            hidden_dim=self.D,
            context_size=1,
            grid_convention="pole_inclusive",
            node_feat_unit="deg_quirk",
        )
        params = ours.init(
            jax.random.PRNGKey(0),
            jnp.asarray(const), jnp.asarray(pres), jnp.asarray(prog),
        )
        tree = self._copied_tree(ref, dict(params["params"]))
        got = np.asarray(
            ours.apply(
                {"params": tree},
                jnp.asarray(const), jnp.asarray(pres), jnp.asarray(prog),
            )
        )
        assert got.shape == want.shape
        mask = self._untied_mask(ref)
        np.testing.assert_allclose(
            got[..., mask], want[..., mask], rtol=1e-3, atol=2e-4
        )


class TestActivationFactoryParity:
    @pytest.mark.parametrize(
        "name", ["silu", "relu", "tanh", "sigmoid", "identity", "stan",
                 "squareplus", "leaky_relu", "elu", "gelu"]
    )
    def test_matches_reference(self, name):
        """Our activation table vs the reference Modulus factory
        (`models/graphcast/utils/activations.py:128-155`)."""
        import importlib.util

        import jax.numpy as jnp
        import torch

        from dlwpbench_tpu.ops.conv import get_activation

        fp = os.path.join(REF, "models", "graphcast", "utils", "activations.py")
        spec = importlib.util.spec_from_file_location("ref_gc_act", fp)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        ref_fn = mod.get_activation(name)
        x = np.linspace(-4, 4, 101, dtype=np.float32)
        if name == "stan":  # Stan(out_features=1) wants a trailing feat dim
            x = x[:, None]
        with torch.no_grad():
            want = ref_fn(torch.as_tensor(x)).numpy()
        ours = "gelu_exact" if name == "gelu" else name  # torch GELU is erf
        got = np.asarray(get_activation(ours)(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestCellAreaWeightedLoss:
    def test_parity(self):
        """`models/graphcast/utils/loss.py:26-56` — cell-area-weighted MSE."""
        import importlib.util

        import jax.numpy as jnp
        import torch

        from dlwpbench_tpu.training.losses import cell_area_weighted_loss

        fp = os.path.join(REF, "models", "graphcast", "utils", "loss.py")
        spec = importlib.util.spec_from_file_location("ref_gc_loss", fp)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        rng = np.random.default_rng(6)
        pred = rng.standard_normal((3, 5, 8, 16)).astype(np.float32)
        tgt = rng.standard_normal((3, 5, 8, 16)).astype(np.float32)
        area = rng.uniform(0.5, 1.5, size=(8, 16)).astype(np.float32)

        ref = mod.CellAreaWeightedLossFunction(torch.as_tensor(area))
        with torch.no_grad():
            want = float(ref(torch.as_tensor(pred), torch.as_tensor(tgt)))

        got = float(
            cell_area_weighted_loss(
                jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(area)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-6)

        # the custom-autograd variant computes the same forward
        ref2 = mod.CustomCellAreaWeightedLossFunction(torch.as_tensor(area))
        want2 = float(ref2(torch.as_tensor(pred), torch.as_tensor(tgt)))
        np.testing.assert_allclose(got, want2, rtol=1e-6)
