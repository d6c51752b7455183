"""Spherical harmonic transform correctness tests (the reference relies on
torch-harmonics; we validate our from-scratch SHT analytically)."""

import numpy as np
import pytest

from dlwpbench_tpu.ops import sht as shtmod


def _grid_field(tables, fn):
    theta = tables.theta
    phi = 2 * np.pi * np.arange(tables.nlon) / tables.nlon
    T, P = np.meshgrid(theta, phi, indexing="ij")
    return fn(T, P)


def _y10(theta, phi):
    return np.sqrt(3 / (4 * np.pi)) * np.cos(theta)


def _y11_real(theta, phi):
    # Re(Y_1^1) with no Condon-Shortley phase: Pbar_11 * cos(phi)
    return np.sqrt(3 / (8 * np.pi)) * np.sin(theta) * np.cos(phi)


def _y32_real(theta, phi):
    # Pbar_32(cos t) cos(2 phi); Pbar includes the ortho normalization
    x = np.cos(theta)
    p32 = 0.25 * np.sqrt(105 / (4 * np.pi)) * (1 - x**2) * x * 2 / np.sqrt(
        105 / (4 * np.pi) / (105 / (4 * np.pi))
    )
    # simpler: unnormalized P_3^2 = 15 x (1-x^2); N = sqrt(7/(4pi) * 1/120)
    p32 = np.sqrt(7 / (4 * np.pi) / 120.0) * 15 * x * (1 - x**2)
    return p32 * np.cos(2 * phi)


@pytest.mark.parametrize("grid", ["legendre-gauss", "equiangular"])
class TestSHTAnalytic:
    def test_y10_delta(self, grid):
        t = shtmod.sht_tables(16, 32, grid=grid)
        f = _grid_field(t, _y10)
        a = np.array(shtmod.sht(np.asarray(f, np.float32)[None], t))[0]
        want = np.zeros_like(a)
        want[1, 0] = 1.0
        np.testing.assert_allclose(a.real, want.real, atol=2e-5)
        assert abs(a[1, 0] - 1.0) < 2e-5

    def test_y11_delta(self, grid):
        t = shtmod.sht_tables(16, 32, grid=grid)
        f = _grid_field(t, _y11_real)
        a = np.array(shtmod.sht(np.asarray(f, np.float32)[None], t))[0]
        # real cos(m phi) component -> coefficient 1/2 at (l=1, m=1)
        assert abs(a[1, 1] - 0.5) < 2e-5
        a[1, 1] = 0
        assert np.abs(a).max() < 2e-5

    def test_y32_delta(self, grid):
        t = shtmod.sht_tables(16, 32, grid=grid)
        f = _grid_field(t, _y32_real)
        a = np.array(shtmod.sht(np.asarray(f, np.float32)[None], t))[0]
        assert abs(a[3, 2] - 0.5) < 5e-5
        a[3, 2] = 0
        assert np.abs(a).max() < 5e-5

    def test_roundtrip_bandlimited(self, grid):
        t = shtmod.sht_tables(16, 32, grid=grid)
        rng = np.random.default_rng(0)
        # random bandlimited field: inverse of random coefficients
        a = np.zeros((t.lmax, t.mmax), np.complex64)
        L = 12  # stay safely inside the band
        for l in range(L):
            for m in range(min(l + 1, t.mmax)):
                a[l, m] = rng.standard_normal() + 1j * rng.standard_normal() * (
                    m > 0
                )
        a[:, 0] = a[:, 0].real
        f = np.asarray(shtmod.isht(a[None], t))[0]
        a2 = np.array(shtmod.sht(f[None], t))[0]
        np.testing.assert_allclose(a2[:L, :L], a[:L, :L], atol=5e-4)

    def test_parseval(self, grid):
        """Energy in coefficient space equals sphere-integrated energy."""
        t = shtmod.sht_tables(24, 48, grid=grid)
        rng = np.random.default_rng(1)
        a = np.zeros((t.lmax, t.mmax), np.complex64)
        for l in range(16):
            for m in range(min(l + 1, 16)):
                a[l, m] = rng.standard_normal() + 1j * rng.standard_normal() * (m > 0)
        a[:, 0] = a[:, 0].real
        f = np.asarray(shtmod.isht(a[None], t))[0]
        # ||f||^2 over sphere = sum |a_l0|^2 + 2 * sum_{m>0} |a_lm|^2
        coeff_energy = np.sum(np.abs(a[:, 0]) ** 2) + 2 * np.sum(
            np.abs(a[:, 1:]) ** 2
        )
        if grid == "legendre-gauss":
            _, w = shtmod.gauss_legendre(24)
        else:
            _, w = shtmod.equiangular_midpoint(24)
        grid_energy = (2 * np.pi / 48) * np.sum(w[:, None] * f**2)
        assert grid_energy == pytest.approx(coeff_energy, rel=1e-3)


@pytest.mark.parametrize("grid", ["legendre-gauss", "equiangular"])
def test_sht_real_matches_complex(grid):
    """The all-real matmul-DFT SHT pair (`sht_real`/`isht_real`) must match
    the jnp.fft path exactly — it is the default compute path for SFNO."""
    t = shtmod.sht_tables(16, 32, grid=grid)
    rng = np.random.default_rng(3)
    f = np.asarray(rng.standard_normal((2, 3, 16, 32)), np.float32)
    a = np.asarray(shtmod.sht(f, t))
    ar, ai = (np.asarray(v) for v in shtmod.sht_real(f, t))
    np.testing.assert_allclose(a.real, ar, atol=2e-6)
    np.testing.assert_allclose(a.imag, ai, atol=2e-6)
    g1 = np.asarray(shtmod.isht(a, t))
    g2 = np.asarray(shtmod.isht_real(ar, ai, t))
    np.testing.assert_allclose(g1, g2, atol=5e-6)


def test_sfno_matmul_path_matches_fft():
    """SFNO2DModule(fft_impl='matmul') — the default — must reproduce the
    complex-FFT path through the full rollout, fwd and grad."""
    import jax
    import jax.numpy as jnp

    from dlwpbench_tpu.models.sfno import SFNO2DModule

    kw = dict(
        constant_channels=2, prescribed_channels=1, prognostic_channels=3,
        embed_dim=16, num_layers=2, height=16, width=32, context_size=1,
    )
    mf = SFNO2DModule(fft_impl="fft", **kw)
    mm = SFNO2DModule(fft_impl="matmul", **kw)
    k = jax.random.PRNGKey(0)
    c = jax.random.normal(k, (1, 1, 2, 16, 32))
    pre = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 1, 16, 32))
    pro = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 3, 16, 32))
    params = mf.init(k, c, pre, pro)
    yf = mf.apply(params, c, pre, pro)
    ym = mm.apply(params, c, pre, pro)
    np.testing.assert_allclose(
        np.asarray(yf), np.asarray(ym), atol=2e-5, rtol=1e-5
    )
    gf = jax.grad(lambda p: (mf.apply(p, c, pre, pro) ** 2).mean())(params)
    gm = jax.grad(lambda p: (mm.apply(p, c, pre, pro) ** 2).mean())(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gm)):
        scale = max(1e-3, float(jnp.abs(a).max()))
        assert float(jnp.abs(a - b).max()) / scale < 1e-4


def test_quadrature_weights_integrate_sin():
    for nodes in [shtmod.gauss_legendre, shtmod.equiangular_midpoint]:
        theta, w = nodes(32)
        assert w.sum() == pytest.approx(2.0, rel=1e-10)  # int sin = 2
        assert np.sum(w * np.cos(theta)) == pytest.approx(0.0, abs=1e-10)
        assert np.sum(w * np.cos(theta) ** 2) == pytest.approx(2 / 3, rel=1e-8)
