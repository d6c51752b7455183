"""Distributed-layer tests on the 8-device virtual CPU mesh: halo exchange,
distributed rfft2, distributed SHT — all checked against single-device ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlwpbench_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs multi-device CPU mesh"
)


def _mesh_x(n=4):
    return make_mesh(n, data=1, x=n)


class TestHalo:
    def test_halo_matches_cylinder_pad(self):
        from jax import shard_map

        from dlwpbench_tpu.ops.padding import cylinder_pad
        from dlwpbench_tpu.parallel.halo import sharded_cylinder_pad

        mesh = _mesh_x(4)
        H, W, p = 16, 24, 1
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((H, W)), jnp.float32
        )
        want = np.asarray(cylinder_pad(x, p))

        f = shard_map(
            lambda a: sharded_cylinder_pad(a, p, "x"),
            mesh=mesh,
            in_specs=P("x", None),
            out_specs=P("x", None),
    
        )
        xs = jax.device_put(x, NamedSharding(mesh, P("x", None)))
        got_blocks = np.asarray(jax.jit(f)(xs))
        # Reassemble: each local block [H/4 + 2, W+2]; interior rows of the
        # global padded array interleave halo+core per shard.  Verify each
        # shard's padded block against the corresponding slice of `want`.
        Hl = H // 4
        got = got_blocks.reshape(4, Hl + 2 * p, W + 2 * p)
        for i in range(4):
            np.testing.assert_allclose(
                got[i], want[i * Hl : i * Hl + Hl + 2 * p], atol=1e-6
            )


class TestDistFFT:
    def test_rfft2_roundtrip_and_parity(self):
        from dlwpbench_tpu.parallel.fft import make_dist_rfft2

        mesh = _mesh_x(4)
        H, W = 16, 24
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((H, W)), jnp.float32
        )
        fwd, inv = make_dist_rfft2(mesh, ndim=2)
        xs = jax.device_put(x, NamedSharding(mesh, P("x", None)))
        Xf = jax.jit(fwd)(xs)
        # parity vs single-device rfft2 (H-axis fft order: fft along H after
        # rfft along W == rfft2 with axes (-2, -1))
        want = np.fft.fft(np.fft.rfft(np.asarray(x), axis=-1), axis=-2)
        wf = W // 2 + 1
        np.testing.assert_allclose(
            np.asarray(Xf)[:, :wf], want, rtol=1e-4, atol=1e-4
        )
        back = jax.jit(lambda a: inv(a, W))(Xf)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)

    def test_batched(self):
        from dlwpbench_tpu.parallel.fft import make_dist_rfft2

        mesh = _mesh_x(4)
        B, H, W = 3, 8, 16
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((B, H, W)), jnp.float32
        )
        fwd, inv = make_dist_rfft2(mesh, ndim=3)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "x", None)))
        back = jax.jit(lambda a: inv(fwd(a), W))(xs)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


class TestDistSHT:
    @pytest.mark.parametrize("grid", ["legendre-gauss", "equiangular"])
    def test_matches_single_device(self, grid):
        from dlwpbench_tpu.ops.sht import isht, sht, sht_tables
        from dlwpbench_tpu.parallel.sht_dist import make_dist_sht

        mesh = _mesh_x(4)
        nlat, nlon = 16, 32
        t = sht_tables(nlat, nlon, grid=grid)
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((nlat, nlon)), jnp.float32
        )
        a_ref = np.asarray(sht(x, t))

        fwd, inv = make_dist_sht(mesh, t, ndim=2)
        xs = jax.device_put(x, NamedSharding(mesh, P("x", None)))
        a = np.asarray(jax.jit(fwd)(xs))
        np.testing.assert_allclose(a[:, : t.mmax], a_ref, rtol=1e-4, atol=1e-4)

        f_ref = np.asarray(isht(jnp.asarray(a_ref), t))
        f = np.asarray(jax.jit(inv)(jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, P(None, "x"))
        )))
        np.testing.assert_allclose(f, f_ref, atol=1e-4)


class TestDistSHTPipelined:
    """The round-4 overlapped schedule (channel-chunked transposes +
    optional bf16 payloads) must be numerically indistinguishable from the
    plain schedule — chunking commutes with the transpose and the
    per-channel contraction."""

    def _setup(self, C=5):
        from dlwpbench_tpu.ops.sht import sht, sht_tables

        mesh = _mesh_x(4)
        nlat, nlon = 16, 32
        t = sht_tables(nlat, nlon, grid="equiangular")
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((2, C, nlat, nlon)),
            jnp.float32,
        )
        a_ref = np.asarray(sht(x, t))
        return mesh, t, x, a_ref

    @pytest.mark.parametrize("chunks", [2, 3, 8])
    def test_pipelined_matches_plain(self, chunks):
        """Uneven chunk splits (C=5) included: concat(chunked) == whole."""
        from dlwpbench_tpu.ops.sht import isht
        from dlwpbench_tpu.parallel.sht_dist import make_dist_sht

        mesh, t, x, a_ref = self._setup()
        fwd, inv = make_dist_sht(mesh, t, ndim=4, pipeline_chunks=chunks)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "x", None)))
        a = np.asarray(jax.jit(fwd)(xs))
        np.testing.assert_allclose(
            a[..., : t.mmax], a_ref, rtol=1e-4, atol=1e-4
        )
        f_ref = np.asarray(isht(jnp.asarray(a_ref), t))
        f = np.asarray(jax.jit(inv)(jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, P(None, None, None, "x"))
        )))
        np.testing.assert_allclose(f, f_ref, atol=1e-4)

    def test_bf16_comm_within_tolerance(self):
        """bf16 transpose payloads: one rounding of the coefficients, so
        the round trip holds to bf16 precision (~1e-2 of field scale)."""
        from dlwpbench_tpu.parallel.sht_dist import make_dist_sht

        mesh, t, x, a_ref = self._setup()
        fwd, inv = make_dist_sht(
            mesh, t, ndim=4, pipeline_chunks=2, comm_dtype=jnp.bfloat16
        )
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "x", None)))
        a = np.asarray(jax.jit(fwd)(xs))
        scale = np.abs(a_ref).max()
        np.testing.assert_allclose(
            a[..., : t.mmax] / scale, a_ref / scale, atol=3e-2
        )

    def test_pipelined_gradient_matches_plain(self):
        from jax import shard_map

        from dlwpbench_tpu.parallel.sht_dist import dist_sht

        mesh, t, x, _ = self._setup()

        def make_loss(chunks):
            def local(al):
                c = dist_sht(al, t, "x", pipeline_chunks=chunks)
                return jax.lax.psum(jnp.sum(jnp.abs(c) ** 2), "x")

            return jax.jit(jax.grad(shard_map(
                local, mesh=mesh,
                in_specs=P(None, None, "x", None), out_specs=P(),
            )))

        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "x", None)))
        g1 = np.asarray(make_loss(1)(xs))
        g3 = np.asarray(make_loss(3)(xs))
        np.testing.assert_allclose(g3, g1, rtol=1e-5, atol=1e-5)

    def test_dist_spherical_conv_pipelined(self):
        """Full mixing layer on the overlapped schedule == plain schedule."""
        from dlwpbench_tpu.ops.sht import sht_tables
        from dlwpbench_tpu.parallel.spectral_dist import (
            make_dist_spherical_conv,
        )

        mesh = _mesh_x(4)
        nlat, nlon, Cin, Cout = 16, 32, 6, 4
        t = sht_tables(nlat, nlon, grid="equiangular")
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.standard_normal((2, Cin, nlat, nlon)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((Cin, Cout, t.lmax, 2)) @ np.array([1, 1j]),
            jnp.complex64,
        )
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "x", None)))
        plain = make_dist_spherical_conv(mesh, t, ndim=4)
        piped = make_dist_spherical_conv(mesh, t, ndim=4, pipeline_chunks=3)
        o1 = np.asarray(jax.jit(plain)(xs, w))
        o2 = np.asarray(jax.jit(piped)(xs, w))
        np.testing.assert_allclose(o2, o1, rtol=1e-5, atol=1e-5)


class TestGraphPartition:
    def test_partitioned_aggregate_matches_single_device(self):
        from jax import shard_map

        from dlwpbench_tpu.parallel.graph_partition import (
            partition_graph_nodewise,
            partitioned_message_passing,
        )

        nparts = 4
        mesh = _mesh_x(nparts)
        rng = np.random.default_rng(0)
        n_src, n_dst, E, F = 37, 29, 200, 8
        src = rng.integers(0, n_src, E)
        dst = rng.integers(0, n_dst, E)
        src_feat = rng.standard_normal((n_src, F)).astype(np.float32)
        edge_feat = rng.standard_normal((E, F)).astype(np.float32)

        # single-device oracle
        want = np.zeros((n_dst, F), np.float32)
        np.add.at(want, dst, src_feat[src] * edge_feat)

        part = partition_graph_nodewise(src, dst, n_src, n_dst, nparts)

        sc, dc = part.src_chunk, part.dst_chunk
        src_pad = np.zeros((nparts * sc, F), np.float32)
        src_pad[:n_src] = src_feat
        ef = np.zeros((nparts, part.n_edges_max, F), np.float32)
        for r in range(nparts):
            e_ids = np.nonzero((dst // dc) == r)[0]
            ef[r, : len(e_ids)] = edge_feat[e_ids]

        f = shard_map(
            lambda s_, e_: partitioned_message_passing(part, s_, e_[0], "x")[
                None
            ],
            mesh=mesh,
            in_specs=(P("x", None), P("x", None, None)),
            out_specs=P("x", None, None),
        )
        got = np.asarray(jax.jit(f)(jnp.asarray(src_pad), jnp.asarray(ef)))
        got = got.reshape(nparts * dc, F)[:n_dst]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestShardedHealpixPad:
    @pytest.mark.parametrize("nside,pad", [(8, 1), (8, 2)])
    def test_eight_way(self, nside, pad):
        self._run(8, nside, pad)

    @pytest.mark.parametrize("nside,pad", [(8, 1), (8, 2)])
    def test_matches_single_device(self, nside, pad):
        self._run(4, nside, pad)

    def _run(self, nparts, nside, pad):
        from dlwpbench_tpu.ops.padding import healpix_pad
        from dlwpbench_tpu.parallel.healpix_sharded import make_sharded_healpix_pad

        mesh = _mesh_x(nparts)
        C = 3
        rng = np.random.default_rng(0)
        x = rng.standard_normal((12, nside, nside, C)).astype(np.float32)

        # oracle: channels-first healpix_pad
        want = np.moveaxis(
            np.asarray(healpix_pad(jnp.moveaxis(jnp.asarray(x), -1, 0), pad)),
            0, -1,
        )

        fn = make_sharded_healpix_pad(mesh, nside, pad)
        got = np.asarray(jax.jit(fn)(jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestDistributedGradients:
    def test_dist_sht_gradient_matches_single_device(self):
        """Autodiff through the all_to_all transposes must produce the same
        gradients as the single-device SHT (the reference hand-codes these
        adjoints, `autograd.py:35-254`; JAX derives them)."""
        from dlwpbench_tpu.ops.sht import sht, sht_tables
        from dlwpbench_tpu.parallel.sht_dist import make_dist_sht

        mesh = _mesh_x(4)
        nlat, nlon = 16, 32
        t = sht_tables(nlat, nlon, grid="equiangular")
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((nlat, nlon)), jnp.float32
        )

        def loss_single(a):
            c = sht(a, t)
            return jnp.sum(jnp.abs(c) ** 2)

        # realistic pattern: the loss lives inside the sharded program
        # (local partial + psum), so autodiff runs through the collectives
        from jax import shard_map

        from dlwpbench_tpu.parallel.sht_dist import dist_sht

        @jax.jit
        def loss_dist(a):
            def local(al):
                c = dist_sht(al, t, "x")
                return jax.lax.psum(jnp.sum(jnp.abs(c) ** 2), "x")

            return shard_map(
                local, mesh=mesh, in_specs=P("x", None), out_specs=P()
            )(a)

        g1 = np.asarray(jax.grad(loss_single)(x))
        xs = jax.device_put(x, NamedSharding(mesh, P("x", None)))
        g2 = np.asarray(jax.jit(jax.grad(loss_dist))(xs))
        np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-4)

    def test_halo_gradient(self):
        from jax import shard_map

        from dlwpbench_tpu.ops.padding import cylinder_pad
        from dlwpbench_tpu.parallel.halo import sharded_cylinder_pad

        mesh = _mesh_x(4)
        x = jnp.asarray(
            np.random.default_rng(6).standard_normal((16, 24)), jnp.float32
        )

        # Loss = sum of squares of a VALID 3x3 conv over the padded slab: each
        # output row is produced exactly once globally (summing the padded
        # array directly would double-count halo rows on the sharded side).
        k = jnp.asarray(np.arange(9, dtype=np.float32).reshape(3, 3) / 10.0)

        def conv_valid(yp):
            H, W = yp.shape[-2] - 2, yp.shape[-1] - 2
            return sum(
                k[i, j] * yp[..., i : i + H, j : j + W]
                for i in range(3)
                for j in range(3)
            )

        g1 = np.asarray(
            jax.grad(lambda a: (conv_valid(cylinder_pad(a, 1)) ** 2).sum())(x)
        )

        @jax.jit
        def loss_dist(a):
            def local(al):
                y = conv_valid(sharded_cylinder_pad(al, 1, "x"))
                return jax.lax.psum((y**2).sum(), "x")

            return shard_map(
                local, mesh=mesh, in_specs=P("x", None), out_specs=P()
            )(a)

        xs = jax.device_put(x, NamedSharding(mesh, P("x", None)))
        g2 = np.asarray(jax.jit(jax.grad(loss_dist))(xs))
        np.testing.assert_allclose(g2, g1, rtol=1e-5, atol=1e-5)


class TestDistributedSpectralLayers:
    def test_dist_spherical_conv_matches_single_device(self):
        """Distributed SFNO mixing layer ≡ single-device SphericalConv math
        (sht -> per-degree channel contraction -> isht, `models/sfno.py`)."""
        from dlwpbench_tpu.ops.sht import isht, sht, sht_tables
        from dlwpbench_tpu.parallel.spectral_dist import make_dist_spherical_conv

        mesh = _mesh_x(4)
        nlat, nlon, Cin, Cout = 16, 32, 3, 5
        t = sht_tables(nlat, nlon, grid="equiangular")
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((2, Cin, nlat, nlon)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((Cin, Cout, t.lmax, 2)) @ np.array([1, 1j]),
            jnp.complex64,
        )

        a = sht(x, t)
        ref = isht(jnp.einsum("bilm,iol->bolm", a, w), t)

        conv = make_dist_spherical_conv(mesh, t, ndim=4)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "x", None)))
        out = np.asarray(jax.jit(conv)(xs, w))
        np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-4)

        # differentiable end-to-end (weight gradient parity)
        gw_ref = jax.grad(
            lambda wc: jnp.sum(
                jnp.abs(isht(jnp.einsum("bilm,iol->bolm", sht(x, t), wc), t)) ** 2
            )
        )(w)
        gw = jax.jit(
            jax.grad(lambda wc: jnp.sum(jnp.abs(conv(xs, wc)) ** 2))
        )(w)
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(gw_ref), rtol=1e-3, atol=1e-3
        )

    def test_dist_afno_filter_matches_single_device(self):
        """Distributed AFNO filter ≡ `ops/spectral.py:AFNO2DFilter` minus its
        residual, including the kept-mode band and softshrink scaling."""
        from dlwpbench_tpu.ops.spectral import AFNO2DFilter
        from dlwpbench_tpu.parallel.spectral_dist import make_dist_afno_filter

        mesh = _mesh_x(4)
        B, H, W, C = 2, 16, 24, 8
        layer = AFNO2DFilter(hidden_size=C, num_blocks=4,
                             hard_thresholding_fraction=0.7)
        x = jnp.asarray(
            np.random.default_rng(12).standard_normal((B, H, W, C)), jnp.float32
        )
        params = layer.init(jax.random.PRNGKey(0), x)
        ref = layer.apply(params, x) - x  # single-device filter adds residual

        p = params["params"]
        f = make_dist_afno_filter(mesh, ndim=4, hard_thresholding_fraction=0.7)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "x", None, None)))
        out = np.asarray(
            jax.jit(f)(xs, p["w1"], p["b1"], p["w2"], p["b2"])
        )
        np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_sfno_with_distributed_sht_matches_single_device(self):
        """SFNO2DModule(spmd_mesh=...) runs its spherical convs through the
        distributed SHT; outputs and parameter gradients must match the
        single-device model bit-for-tolerance with identical params."""
        from dlwpbench_tpu.models.sfno import SFNO2DModule

        mesh = _mesh_x(4)
        kw = dict(
            constant_channels=0,
            prescribed_channels=0,
            prognostic_channels=2,
            num_layers=1,
            embed_dim=8,
            context_size=1,
            height=16,
            width=32,
        )
        m0 = SFNO2DModule(**kw)
        m1 = SFNO2DModule(spmd_mesh=mesh, **kw)
        prog = jnp.asarray(
            np.random.default_rng(9).standard_normal((2, 3, 2, 16, 32)),
            jnp.float32,
        )
        params = m0.init(jax.random.PRNGKey(0), None, None, prog)

        out0 = np.asarray(m0.apply(params, None, None, prog))
        ps = jax.device_put(
            prog, NamedSharding(mesh, P(None, None, None, "x", None))
        )
        out1 = np.asarray(jax.jit(
            lambda p, x: m1.apply(p, None, None, x)
        )(params, ps))
        np.testing.assert_allclose(out1, out0, rtol=2e-3, atol=2e-3)

        def loss(m):
            def f(p, x):
                return (m.apply(p, None, None, x) ** 2).mean()
            return f

        g0 = jax.grad(loss(m0))(params, prog)
        g1 = jax.jit(jax.grad(loss(m1)))(params, ps)
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-8)),
            g0, g1,
        )
        assert max(jax.tree.leaves(diff)) < 5e-3

    def _fused_setup(self, num_layers=2, K=3):
        """Raw-weight SFNO block stack + single-device reference math
        (`models/sfno.py:161-172` composition: conv + skip -> gelu ->
        MLP residual), for the fused chunk-pipelined schedule."""
        from dlwpbench_tpu.ops.sht import sht_tables

        mesh = _mesh_x(4)
        nlat, nlon, C, HD = 16, 32, 6, 12
        t = sht_tables(nlat, nlon, grid="equiangular")
        rng = np.random.default_rng(21)

        def r(*shape, s=0.3):
            return jnp.asarray(s * rng.standard_normal(shape), jnp.float32)

        layers = [
            {
                "spec": r(C, C, t.lmax, 2),
                "skip_k": r(C, C), "skip_b": r(C),
                "mlp1_k": r(C, HD), "mlp1_b": r(HD),
                "mlp2_k": r(HD, C), "mlp2_b": r(C),
            }
            for _ in range(num_layers)
        ]
        x = jnp.asarray(
            rng.standard_normal((2, nlat, nlon, C)), jnp.float32
        )
        return mesh, t, x, layers

    @staticmethod
    def _fused_ref(x, layers, t):
        """Single-device block-stack math (channels-last in/out)."""
        from dlwpbench_tpu.ops.sht import isht, sht

        for L in layers:
            wc = L["spec"][..., 0] + 1j * L["spec"][..., 1]
            a = sht(jnp.moveaxis(x, -1, 1), t)
            conv = jnp.moveaxis(
                isht(jnp.einsum("bilm,iol->bolm", a, wc), t), 1, -1
            )
            z = jax.nn.gelu(conv + x @ L["skip_k"] + L["skip_b"])
            h = jax.nn.gelu(z @ L["mlp1_k"] + L["mlp1_b"])
            x = z + h @ L["mlp2_k"] + L["mlp2_b"]
        return x

    @pytest.mark.parametrize("K", [1, 3, 6])
    def test_fused_sfno_blocks_match_per_layer_math(self, K):
        """The fused cross-boundary pipeline (dist_sfno_blocks) is the same
        math as the per-layer composition for any chunk count, including
        uneven splits (C=6, K=3) and the no-chunk edge (K=1)."""
        from dlwpbench_tpu.parallel.spectral_dist import make_dist_sfno_blocks

        mesh, t, x, layers = self._fused_setup()
        ref = np.asarray(self._fused_ref(x, layers, t))
        fn = make_dist_sfno_blocks(mesh, t, pipeline_chunks=K)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "x", None, None)))
        out = np.asarray(jax.jit(fn)(xs, layers))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_fused_sfno_blocks_gradients(self):
        """Input and parameter gradients of the fused schedule match the
        single-device composition (differentiable through the chunked
        transposes and partial-sum contractions)."""
        from dlwpbench_tpu.parallel.spectral_dist import make_dist_sfno_blocks

        mesh, t, x, layers = self._fused_setup(num_layers=1, K=3)
        fn = make_dist_sfno_blocks(mesh, t, pipeline_chunks=3)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "x", None, None)))

        g_ref = jax.grad(
            lambda a, ls: jnp.sum(self._fused_ref(a, ls, t) ** 2), (0, 1)
        )(x, layers)
        g = jax.jit(
            jax.grad(lambda a, ls: jnp.sum(fn(a, ls) ** 2), (0, 1))
        )(xs, layers)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3
            )

    def test_fused_sfno_blocks_bf16_comm_within_tolerance(self):
        """bf16 transpose payloads under the fused schedule: one rounding
        per coefficient crossing, so outputs track fp32 comm to bf16
        precision of the field scale."""
        from dlwpbench_tpu.parallel.spectral_dist import make_dist_sfno_blocks

        mesh, t, x, layers = self._fused_setup()
        fn32 = make_dist_sfno_blocks(mesh, t, pipeline_chunks=3)
        fnbf = make_dist_sfno_blocks(
            mesh, t, pipeline_chunks=3, comm_dtype=jnp.bfloat16
        )
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "x", None, None)))
        o32 = np.asarray(jax.jit(fn32)(xs, layers))
        obf = np.asarray(jax.jit(fnbf)(xs, layers))
        scale = np.abs(o32).max()
        np.testing.assert_allclose(obf / scale, o32 / scale, atol=3e-2)

    def _mesh_xc(self, x=4, c=2):
        from jax.sharding import Mesh

        devs = np.array(jax.devices()[: x * c]).reshape(x, c)
        return Mesh(devs, ("x", "c"))

    @pytest.mark.parametrize("K", [1, 3])
    def test_fused_2d_matches_per_layer_math(self, K):
        """The 2D (latitude x channel) fused schedule
        (`dist_sfno_blocks_2d`, the >8-chip strong-scaling path) is the
        same math as the single-device composition."""
        from dlwpbench_tpu.parallel.spectral_dist import (
            make_dist_sfno_blocks_2d,
        )

        _, t, x, layers = self._fused_setup()
        mesh = self._mesh_xc()
        ref = np.asarray(self._fused_ref(x, layers, t))
        fn = make_dist_sfno_blocks_2d(mesh, t, pipeline_chunks=K)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "x", None, "c")))
        out = np.asarray(jax.jit(fn)(xs, layers))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_fused_2d_gradients(self):
        """Input + parameter grads of the 2D schedule match the
        single-device composition (differentiable through psum_scatter
        channel reductions and the chunked transposes)."""
        from dlwpbench_tpu.parallel.spectral_dist import (
            make_dist_sfno_blocks_2d,
        )

        _, t, x, layers = self._fused_setup(num_layers=1)
        mesh = self._mesh_xc()
        fn = make_dist_sfno_blocks_2d(mesh, t, pipeline_chunks=3)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "x", None, "c")))

        g_ref = jax.grad(
            lambda a, ls: jnp.sum(self._fused_ref(a, ls, t) ** 2), (0, 1)
        )(x, layers)
        g = jax.jit(
            jax.grad(lambda a, ls: jnp.sum(fn(a, ls) ** 2), (0, 1))
        )(xs, layers)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3
            )

    def test_sfno_model_fused_schedule_runs_and_chunk_invariant(self):
        """SFNO2DModule(dist_schedule="fused"): forward runs on the mesh,
        outputs are chunk-count invariant, grads are finite."""
        from dlwpbench_tpu.models.sfno import SFNO2DModule

        mesh = _mesh_x(4)
        kw = dict(
            constant_channels=0, prescribed_channels=0,
            prognostic_channels=2, num_layers=2, embed_dim=8,
            context_size=1, height=16, width=32,
            spmd_mesh=mesh, dist_schedule="fused",
        )
        m4 = SFNO2DModule(dist_pipeline_chunks=4, **kw)
        m1 = SFNO2DModule(dist_pipeline_chunks=1, **kw)
        prog = jnp.asarray(
            np.random.default_rng(5).standard_normal((2, 3, 2, 16, 32)),
            jnp.float32,
        )
        params = m4.init(jax.random.PRNGKey(0), None, None, prog)
        assert "blocks_0_spec" in str(
            jax.tree_util.tree_flatten_with_path(params)[0]
        )
        ps = jax.device_put(
            prog, NamedSharding(mesh, P(None, None, None, "x", None))
        )
        o4 = np.asarray(jax.jit(
            lambda p, a: m4.apply(p, None, None, a))(params, ps))
        o1 = np.asarray(jax.jit(
            lambda p, a: m1.apply(p, None, None, a))(params, ps))
        np.testing.assert_allclose(o4, o1, rtol=2e-4, atol=2e-4)
        g = jax.jit(jax.grad(
            lambda p, a: (m4.apply(p, None, None, a) ** 2).mean()
        ))(params, ps)
        assert all(
            bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(g)
        )

    def test_fourcastnet_with_distributed_afno_matches_single_device(self):
        """FourCastNet(spmd_mesh=...) runs its AFNO filters over the
        distributed rFFT2; rollout and grads must match single-device."""
        from dlwpbench_tpu.models.fourcastnet import FourCastNet

        mesh = _mesh_x(4)
        kw = dict(
            img_height=16,
            img_width=24,
            constant_channels=0,
            prescribed_channels=0,
            prognostic_channels=2,
            embed_dim=8,
            depth=1,
            num_blocks=4,
            context_size=1,
        )
        m0 = FourCastNet(**kw)
        m1 = FourCastNet(spmd_mesh=mesh, **kw)
        prog = jnp.asarray(
            np.random.default_rng(10).standard_normal((2, 3, 2, 16, 24)),
            jnp.float32,
        )
        params = m0.init(jax.random.PRNGKey(0), None, None, prog)
        out0 = np.asarray(m0.apply(params, None, None, prog))
        ps = jax.device_put(
            prog, NamedSharding(mesh, P(None, None, None, "x", None))
        )
        out1 = np.asarray(jax.jit(
            lambda p, x: m1.apply(p, None, None, x)
        )(params, ps))
        np.testing.assert_allclose(out1, out0, rtol=2e-3, atol=2e-3)

        def loss(m):
            return lambda p, x: (m.apply(p, None, None, x) ** 2).mean()

        g0 = jax.grad(loss(m0))(params, prog)
        g1 = jax.jit(jax.grad(loss(m1)))(params, ps)
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-8)),
            g0, g1,
        )
        assert max(jax.tree.leaves(diff)) < 5e-3

    def test_graphcast_partitioned_processor_matches_single_device(self):
        """GraphCastNet(spmd_mesh=...) runs its multimesh trunk nodewise-
        partitioned (padded all_to_all buckets); rollout and grads must
        match the single-device model with the same params."""
        from dlwpbench_tpu.models.graphcast import GraphCastNet

        mesh = _mesh_x(4)
        kw = dict(
            input_height=8,
            input_width=16,
            constant_channels=0,
            prescribed_channels=0,
            prognostic_channels=2,
            mesh_level=1,
            processor_layers=2,
            hidden_dim=16,
            context_size=1,
        )
        m0 = GraphCastNet(**kw)
        m1 = GraphCastNet(spmd_mesh=mesh, **kw)
        prog = jnp.asarray(
            np.random.default_rng(13).standard_normal((2, 3, 2, 8, 16)),
            jnp.float32,
        )
        params = m0.init(jax.random.PRNGKey(0), None, None, prog)
        out0 = np.asarray(m0.apply(params, None, None, prog))
        out1 = np.asarray(jax.jit(
            lambda p, x: m1.apply(p, None, None, x)
        )(params, prog))
        np.testing.assert_allclose(out1, out0, rtol=2e-3, atol=2e-3)

        def loss(m):
            return lambda p, x: (m.apply(p, None, None, x) ** 2).mean()

        g0 = jax.grad(loss(m0))(params, prog)
        g1 = jax.jit(jax.grad(loss(m1)))(params, prog)
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-8)),
            g0, g1,
        )
        assert max(jax.tree.leaves(diff)) < 5e-3

    def test_graphcast_partitioned_in_out_rollout(self):
        """Full-rollout partitioning (VERDICT item 5): input sharded over
        the grid axis, output sharded the same way, 3-step closed-loop
        rollout equal to the single-device model — the reference's
        expect_partitioned_input/produce_aggregated_output semantics
        (`graph_cast_net.py:113-133,669-736`) with features partitioned
        across scan steps."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dlwpbench_tpu.models.graphcast import GraphCastNet

        mesh = _mesh_x(4)
        kw = dict(
            input_height=8,
            input_width=16,
            constant_channels=0,
            prescribed_channels=0,
            prognostic_channels=2,
            mesh_level=1,
            processor_layers=2,
            hidden_dim=16,
            context_size=1,
        )
        m0 = GraphCastNet(**kw)
        m1 = GraphCastNet(spmd_mesh=mesh, **kw)
        prog = jnp.asarray(
            np.random.default_rng(21).standard_normal((1, 4, 2, 8, 16)),
            jnp.float32,
        )
        params = m0.init(jax.random.PRNGKey(0), None, None, prog)

        sh = NamedSharding(mesh, P(None, None, None, "x", None))
        prog_sh = jax.device_put(prog, sh)
        roll = jax.jit(
            lambda p, x: m1.apply(p, None, None, x), out_shardings=sh
        )
        out_part = roll(params, prog_sh)
        assert out_part.sharding.is_equivalent_to(sh, out_part.ndim)
        out0 = np.asarray(m0.apply(params, None, None, prog))
        np.testing.assert_allclose(
            np.asarray(out_part), out0, rtol=2e-3, atol=2e-3
        )


class TestRingAttention:
    """Ring (context-parallel) window attention: sequence-sharded chunks +
    ppermute rotation + log-sum-exp merge == single-device attention."""

    def _operands(self, B=2, H=2, N=256, D=16, G=1, seed=5):
        r = np.random.default_rng(seed)
        q = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        bias = jnp.asarray(
            0.1 * r.standard_normal((G, H, N, N)), jnp.float32
        )
        return q, k, v, bias

    def test_matches_single_device(self):
        from dlwpbench_tpu.ops.pallas_attention import reference_attention
        from dlwpbench_tpu.parallel.ring_attention import (
            ring_attention_sharded,
        )

        mesh = _mesh_x(4)
        q, k, v, bias = self._operands()
        out = ring_attention_sharded(q, k, v, bias, mesh, axis="x")
        want = reference_attention(q, k, v, bias, q.shape[-1] ** -0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_grouped_bias_and_mask(self):
        """Grouped bias [G, H, N, N] with -100 mask regions survives the
        chunked merge (mask rows straddle chunk boundaries)."""
        from dlwpbench_tpu.ops.pallas_attention import reference_attention
        from dlwpbench_tpu.parallel.ring_attention import (
            ring_attention_sharded,
        )

        mesh = _mesh_x(4)
        q, k, v, bias = self._operands(B=4, G=2, seed=7)
        bias = bias.at[:, :, :100, 150:].add(-100.0)
        out = ring_attention_sharded(q, k, v, bias, mesh, axis="x")
        want = reference_attention(q, k, v, bias, q.shape[-1] ** -0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_2d_seq_x_head_matches_single_device(self):
        """The 2D (sequence x head) decomposition — ring over 'x' within
        each head group, heads over 'h' — equals single-device attention
        (the >8-chip strong-scaling schedule, no new collectives)."""
        from jax.sharding import Mesh

        from dlwpbench_tpu.ops.pallas_attention import reference_attention
        from dlwpbench_tpu.parallel.ring_attention import (
            ring_attention_sharded,
        )

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("x", "h"))
        q, k, v, bias = self._operands(H=4)
        out = ring_attention_sharded(
            q, k, v, bias, mesh, axis="x", head_axis="h"
        )
        want = reference_attention(q, k, v, bias, q.shape[-1] ** -0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_gradients_match(self):
        """d(q,k,v,bias) through the ring (chunk custom-VJP + lse cotangent
        + slice adjoint + ppermute inverse) == single-device gradients."""
        from dlwpbench_tpu.ops.pallas_attention import reference_attention
        from dlwpbench_tpu.parallel.ring_attention import (
            ring_attention_sharded,
        )

        mesh = _mesh_x(4)
        q, k, v, bias = self._operands(N=128, seed=9)
        w = jnp.cos(jnp.arange(q.shape[-1], dtype=jnp.float32))

        def loss_ring(q, k, v, b):
            return (
                ring_attention_sharded(q, k, v, b, mesh, axis="x") * w
            ).sum()

        def loss_ref(q, k, v, b):
            return (
                reference_attention(q, k, v, b, q.shape[-1] ** -0.5) * w
            ).sum()

        g1 = jax.grad(loss_ring, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip("qkvb", g1, g2):
            assert a.shape == b.shape, name
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"d{name}",
            )

    def test_swin_model_ring_matches_single_device(self):
        """SwinTransformer(spmd_mesh=...) routes every window attention
        through the ring; the full rollout must equal the single-device
        model with the same params."""
        from dlwpbench_tpu.models.swin import SwinTransformer

        mesh = _mesh_x(4)
        kw = dict(
            img_height=16, img_width=32, patch_size=1,
            constant_channels=0, prescribed_channels=0,
            prognostic_channels=2, embed_dim=16, depths=(2,),
            num_heads=(2,), context_size=1,
        )
        single = SwinTransformer(**kw)
        ring = SwinTransformer(spmd_mesh=mesh, dist_axis="x", **kw)
        prog = jnp.asarray(
            np.random.default_rng(3).standard_normal((1, 3, 2, 16, 32)),
            jnp.float32,
        )
        params = single.init(jax.random.PRNGKey(0), None, None, prog)
        want = single.apply(params, None, None, prog)
        got = ring.apply(params, None, None, prog)  # same param tree
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
        )

    def test_pangu_model_ring_matches_single_device(self):
        """PanguWeather(spmd_mesh=..., use_flash_attention=True): the 3D
        earth-window attentions (incl. shifted blocks' grouped lon masks)
        run through the ring and match the single-device rollout."""
        from dlwpbench_tpu.models.pangu import PanguWeather

        mesh = _mesh_x(4)
        kw = dict(
            constant_channels=0, prescribed_channels=0,
            prognostic_channels=2, embed_dim=32,
            num_heads=(2, 4, 4, 2), window_size=(2, 6, 12),
            patch_size=(1, 1), n_lat=12, n_lon=24, context_size=1,
            use_flash_attention=True,
        )
        single = PanguWeather(**kw)
        ring = PanguWeather(spmd_mesh=mesh, dist_axis="x", **kw)
        prog = jnp.asarray(
            np.random.default_rng(4).standard_normal((1, 2, 2, 12, 24)),
            jnp.float32,
        )
        params = single.init(jax.random.PRNGKey(0), None, None, prog)
        want = single.apply(params, None, None, prog)
        got = ring.apply(params, None, None, prog)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
        )


class TestMultihostLaunch:
    """parallel/launch.py: the reference DistributedManager's rank
    discovery (`manager.py:206-316`) mapped onto jax.distributed."""

    def test_torch_style_spec_parsing(self):
        from dlwpbench_tpu.parallel.launch import torch_style_spec

        env = {"MASTER_ADDR": "10.0.0.1", "MASTER_PORT": "29500",
               "RANK": "3", "WORLD_SIZE": "8"}
        spec = torch_style_spec(env)
        assert spec == {"coordinator_address": "10.0.0.1:29500",
                        "num_processes": 8, "process_id": 3}
        # the reference's default port when MASTER_PORT is unset
        spec = torch_style_spec({"MASTER_ADDR": "h", "RANK": "0",
                                 "WORLD_SIZE": "2"})
        assert spec["coordinator_address"] == "h:12355"
        assert torch_style_spec({}) is None

    def test_initialize_single_process_noop(self, monkeypatch):
        from dlwpbench_tpu.parallel import launch

        for var in ("MASTER_ADDR", "RANK", "WORLD_SIZE", "SLURM_PROCID",
                    "OMPI_COMM_WORLD_RANK", "TPU_WORKER_HOSTNAMES",
                    "CLOUD_TPU_TASK_ID"):
            monkeypatch.delenv(var, raising=False)
        assert launch.initialize() is False
        # WORLD_SIZE=1 is also a single-process run
        assert launch.initialize(
            {"coordinator_address": "h:1", "num_processes": 1,
             "process_id": 0}) is False

    def test_global_mesh_and_host_info(self):
        import jax

        from dlwpbench_tpu.parallel import launch

        host_id, n_hosts = launch.host_info()
        assert (host_id, n_hosts) == (0, 1)
        mesh = launch.global_mesh(x=2)
        assert mesh.shape == {"data": len(jax.devices()) // 2, "x": 2}

    def test_train_cli_multihost_single_process(self, tmp_path):
        """training.multihost=true on one process: rank discovery no-ops,
        the mesh spans all (virtual) devices, training runs."""
        import os
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "..", "scripts"))
        import importlib

        train = importlib.import_module("train")
        run_dir = str(tmp_path / "mh")
        train.main([
            "model=unet", "data=synthetic",
            "data.height=16", "data.width=32",
            "training.epochs=1", "training.batch_size=8",
            "training.sequence_length=3", "validation.sequence_length=3",
            "training.multihost=true",
            f"run_dir={run_dir}", "verbose=false",
        ])
        assert os.path.exists(
            os.path.join(run_dir, "checkpoints", "unet_last.ckpt"))


class TestMultiProcess:
    """REAL multi-process distributed: 2 OS processes, CPU backend, one
    coordinator — the `jax.distributed.initialize` handshake + a
    cross-process psum + DP train-step loss parity (the path SURVEY §4
    flags as degenerate in the reference: its DistributedManager tests
    only ever ran at world_size 1)."""

    def test_two_process_dp_train_step(self, tmp_path):
        import os
        import socket
        import subprocess
        import sys

        # free port for the coordinator
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        child = os.path.join(os.path.dirname(__file__),
                             "_distributed_child.py")
        env_base = dict(os.environ)
        # never let the children touch the real TPU tunnel (axon): drop the
        # pool registration trigger and force the CPU backend with 4
        # virtual devices per process (8 global over 2 processes)
        env_base.pop("PALLAS_AXON_POOL_IPS", None)
        env_base["JAX_PLATFORMS"] = "cpu"
        env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env_base["MASTER_ADDR"] = "127.0.0.1"
        env_base["MASTER_PORT"] = str(port)
        env_base["WORLD_SIZE"] = "2"
        env_base["DIST_RUN_DIR"] = str(tmp_path / "mh2")

        procs = []
        for rank in range(2):
            env = dict(env_base, RANK=str(rank))
            procs.append(subprocess.Popen(
                [sys.executable, child], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            ))
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for rank, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        losses = []
        for out in outs:
            line = [l for l in out.splitlines() if l.startswith("DIST_OK")]
            assert line, out[-2000:]
            losses.append(float(line[0].split("loss=")[1]))
        # both processes agree on the reference loss
        assert losses[0] == losses[1]
