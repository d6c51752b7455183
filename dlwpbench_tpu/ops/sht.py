"""From-scratch real spherical harmonic transform (SHT) — replaces the
reference's torch-harmonics CUDA dependency (`models/fno/fno.py:8`,
`README.md:42-51`) with a first-party JAX implementation.

Math (torch-harmonics-compatible orthonormal convention):
  forward:  a[l, m] = 2*pi * sum_j w_j * Pbar_lm(theta_j) * X_m(j),
            X = rfft(f, lon axis, norm="forward")
  inverse:  X_m(j) = sum_l Pbar_lm(theta_j) * a[l, m];  f = irfft(X, "forward")

with Pbar the orthonormalized associated Legendre functions (including the
sqrt((2l+1)/(4pi) (l-m)!/(l+m)!) factor), so Y_lm = Pbar e^{i m phi} is an
orthonormal basis and forward(Y_lm) -> delta.

Grids (reference `configs/model/sfno.yaml` grid choices):
- "legendre-gauss": Gauss-Legendre colatitude nodes + weights (quadrature
  exact to degree 2*nlat-1).
- "equiangular": cell-centered colatitudes theta_j = pi (j+1/2)/nlat
  (the WeatherBench row layout) with Fejer-type quadrature weights obtained
  by moment matching in the cosine basis — exact for trigonometric
  polynomials up to degree nlat-1.

TPU design: the Legendre contraction is a single dense einsum
[..., nlat, m] x [m, nlat, l] -> MXU matmuls batched over m; the longitude
transform is XLA's rfft.  All tables are precomputed in numpy (float64) once
per (nlat, nlon, lmax, mmax, grid) and cached.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def gauss_legendre(nlat: int) -> tuple[np.ndarray, np.ndarray]:
    """Colatitude nodes (ascending theta, i.e. north->south) + weights for
    integrating f(theta) sin(theta) dtheta over [0, pi]."""
    x, w = np.polynomial.legendre.leggauss(nlat)  # x ascending in cos-space
    # cos(theta) = x; ascending theta means descending x
    theta = np.arccos(x[::-1])
    return theta, w[::-1].copy()


def equiangular_midpoint(nlat: int) -> tuple[np.ndarray, np.ndarray]:
    """Cell-centered equiangular colatitudes + Fejer moment-matched weights."""
    theta = np.pi * (np.arange(nlat) + 0.5) / nlat
    k = np.arange(nlat)
    # target moments: t_k = int_0^pi cos(k theta) sin(theta) dtheta
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (1.0 + np.cos(np.pi * k)) / (1.0 - k.astype(np.float64) ** 2)
    t[1] = 0.0
    # C[k, j] = cos(k theta_j); DCT-III-like system, solve exactly.
    C = np.cos(np.outer(k, theta))
    w = np.linalg.solve(C, t)
    return theta, w


def _legendre_table(lmax: int, mmax: int, x: np.ndarray) -> np.ndarray:
    """Orthonormalized associated Legendre functions.

    Returns [mmax, lmax, nlat] float64, zero where l < m.  Stable three-term
    recurrences; no Condon-Shortley phase (matching torch-harmonics).
    """
    nlat = x.shape[0]
    out = np.zeros((mmax, lmax, nlat))
    sx = np.sqrt(np.clip(1.0 - x * x, 0.0, None))  # sin(theta)

    # Sectoral seeds: Pbar_m^m
    pmm = np.full(nlat, np.sqrt(1.0 / (4.0 * np.pi)))
    for m in range(mmax):
        if m > 0:
            pmm = pmm * sx * np.sqrt((2 * m + 1) / (2.0 * m))
        if m < lmax:
            out[m, m] = pmm
        # l = m+1 term
        if m + 1 < lmax:
            out[m, m + 1] = np.sqrt(2 * m + 3.0) * x * pmm
        for l in range(m + 2, lmax):
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(
                ((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0)
            )
            out[m, l] = a * (x * out[m, l - 1] - b * out[m, l - 2])
    return out


class SHTTables(NamedTuple):
    nlat: int
    nlon: int
    lmax: int
    mmax: int
    fwd: np.ndarray  # [mmax, nlat, lmax]: 2*pi * w_j * Pbar_lm(theta_j)
    inv: np.ndarray  # [mmax, lmax, nlat]: Pbar_lm(theta_j)
    theta: np.ndarray


@functools.lru_cache(maxsize=None)
def sht_tables(
    nlat: int,
    nlon: int,
    lmax: int | None = None,
    mmax: int | None = None,
    grid: str = "equiangular",
) -> SHTTables:
    lmax = lmax or nlat
    mmax = mmax or min(nlon // 2 + 1, lmax)
    if grid == "legendre-gauss":
        theta, w = gauss_legendre(nlat)
    elif grid == "equiangular":
        theta, w = equiangular_midpoint(nlat)
    else:
        raise ValueError(f"unknown grid {grid!r}")
    x = np.cos(theta)
    plm = _legendre_table(lmax, mmax, x)  # [m, l, nlat]
    if grid == "legendre-gauss":
        # Gauss quadrature is exact to degree 2*nlat-1: analysis = weighted
        # adjoint of synthesis.
        fwd = 2.0 * np.pi * np.transpose(plm * w[None, None, :], (0, 2, 1))
    else:
        # Midpoint-equiangular quadrature is inexact near the top of the
        # band (degree of Pbar products exceeds the trig-moment exactness),
        # which torch-harmonics tolerates.  We do better: per-m least-squares
        # analysis (pseudo-inverse of the synthesis matrix), which makes
        # sht(isht(a)) == a exactly for bandlimited fields.
        fwd = np.zeros((mmax, nlat, lmax))
        for m in range(mmax):
            S = plm[m].T  # [nlat, lmax] synthesis (zero cols for l < m)
            cols = np.arange(m, lmax)
            A = np.linalg.pinv(S[:, cols])  # [L_m, nlat]
            fwd[m, :, cols] = A
    return SHTTables(
        nlat=nlat,
        nlon=nlon,
        lmax=lmax,
        mmax=mmax,
        fwd=fwd.astype(np.float32),
        inv=plm.astype(np.float32),
        theta=theta,
    )


@functools.lru_cache(maxsize=None)
def _lon_dft_tables(nlon: int, mmax: int):
    """Longitude DFT as real matrices (norm="forward" rfft convention).

    Returns (cr, ci, icr, ici):
      forward  X_m = f @ (cr + i*ci):        cr/ci  [nlon, mmax]
      inverse  f   = Xr @ icr + Xi @ ici:    icr/ici [mmax, nlon]
    matching jnp.fft.rfft/irfft(norm="forward") restricted to the first
    `mmax` frequencies (hermitian doubling folded into the inverse, so a
    truncated band needs no zero-padding).
    """
    k = np.arange(nlon)[:, None]
    m = np.arange(mmax)[None, :]
    ang = 2.0 * np.pi * k * m / nlon
    cr = (np.cos(ang) / nlon).astype(np.float32)
    ci = (-np.sin(ang) / nlon).astype(np.float32)
    alpha = np.full(mmax, 2.0)
    alpha[0] = 1.0
    if nlon % 2 == 0 and mmax == nlon // 2 + 1:
        alpha[-1] = 1.0
    icr = (alpha[:, None] * np.cos(ang.T)).astype(np.float32)
    ici = (-alpha[:, None] * np.sin(ang.T)).astype(np.float32)
    return cr, ci, icr, ici


def sht_real(
    f: jax.Array, tables: SHTTables
) -> tuple[jax.Array, jax.Array]:
    """Forward SHT with the longitude DFT as real matmuls (no complex dtype,
    no XLA FFT op — everything lowers to MXU contractions and fuses).

    f: [..., nlat, nlon] real -> (ar, ai) each [..., lmax, mmax].
    Numerically identical to `sht` (which uses jnp.fft.rfft); preferred on
    TPU where the FFT op is overhead-bound at weather-grid sizes (see
    `ops/spectral.py` and `results/fourcastnet_analysis.md`).
    """
    cr, ci, icr, ici = (jnp.asarray(m) for m in _lon_dft_tables(tables.nlon, tables.mmax))
    f = f.astype(jnp.float32)
    Xr = jnp.einsum("...jk,km->...jm", f, cr)
    Xi = jnp.einsum("...jk,km->...jm", f, ci)
    fwd = jnp.asarray(tables.fwd)  # [mmax, nlat, lmax]
    ar = jnp.einsum("...jm,mjl->...lm", Xr, fwd)
    ai = jnp.einsum("...jm,mjl->...lm", Xi, fwd)
    return ar, ai


def isht_real(ar: jax.Array, ai: jax.Array, tables: SHTTables) -> jax.Array:
    """Inverse of `sht_real`: (ar, ai) [..., lmax, mmax] -> [..., nlat, nlon]."""
    cr, ci, icr, ici = (jnp.asarray(m) for m in _lon_dft_tables(tables.nlon, tables.mmax))
    inv = jnp.asarray(tables.inv)  # [mmax, lmax, nlat]
    Xr = jnp.einsum("...lm,mlj->...jm", ar, inv)
    Xi = jnp.einsum("...lm,mlj->...jm", ai, inv)
    return jnp.einsum("...jm,mk->...jk", Xr, icr) + jnp.einsum(
        "...jm,mk->...jk", Xi, ici
    )


def sht(f: jax.Array, tables: SHTTables) -> jax.Array:
    """Forward real SHT.  f: [..., nlat, nlon] real -> [..., lmax, mmax] cplx."""
    X = jnp.fft.rfft(f.astype(jnp.float32), axis=-1, norm="forward")
    X = X[..., : tables.mmax]  # [..., nlat, mmax]
    fwd = jnp.asarray(tables.fwd)  # [mmax, nlat, lmax]
    # a[..., l, m] = sum_j X[..., j, m] * fwd[m, j, l]
    return jnp.einsum("...jm,mjl->...lm", X, fwd.astype(X.dtype))


def isht(a: jax.Array, tables: SHTTables) -> jax.Array:
    """Inverse real SHT.  a: [..., lmax, mmax] complex -> [..., nlat, nlon]."""
    inv = jnp.asarray(tables.inv)  # [mmax, lmax, nlat]
    X = jnp.einsum("...lm,mlj->...jm", a, inv.astype(a.dtype))
    nfreq = tables.nlon // 2 + 1
    if tables.mmax < nfreq:
        pad = [(0, 0)] * (X.ndim - 1) + [(0, nfreq - tables.mmax)]
        X = jnp.pad(X, pad)
    return jnp.fft.irfft(X, n=tables.nlon, axis=-1, norm="forward")


def laplacian_eigenvalues(lmax: int, radius: float = 1.0) -> np.ndarray:
    """-l(l+1)/r^2 spectrum of the sphere Laplacian (for spectral solvers)."""
    l = np.arange(lmax)
    return -l * (l + 1) / (radius * radius)
