"""Distributed spherical harmonic transform (shard_map over ICI).

The reference distributes spectral transforms by 1D-transform + transpose
collective + 1D-transform (`distributed/fft.py`); the SHT follows the same
recipe (SURVEY 2.7): with latitude rows sharded,

  forward: local rfft over longitude -> all_to_all transpose so the m
  (azimuthal order) axis is sharded and latitude is full -> per-local-m
  Legendre contraction (a batched matmul against the m-slice of the
  precomputed table).

  inverse: per-local-m synthesis -> transpose back -> local irfft.

The Legendre tables are sliced per shard with `lax.dynamic_slice_in_dim`
on the mesh axis index, so each chip holds only its m-block — the memory
layout a pod-scale SHT needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dlwpbench_tpu.ops.sht import SHTTables


def _vma_safe_rfft(x: jax.Array, nfreq: int) -> jax.Array:
    """rfft (norm="forward") via complex FFT + slice.

    `jnp.fft.rfft`'s transpose rule (`jax/_src/lax/fft.py:_rfft_transpose`)
    is built with `linear_transpose` over fixed unvarying avals and rejects
    the varying-manual-axes cotangents produced by `jax.grad` through
    `shard_map`.  The complex-FFT transpose is just another FFT, so routing
    the forward through it keeps the distributed transforms differentiable
    (~2x FFT flops; negligible next to the Legendre contraction).
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])  # rank>2 C2C FFTs hang the axon compiler
    X = jnp.fft.fft(x2.astype(jnp.complex64), axis=-1, norm="forward")
    return X[..., :nfreq].reshape(*shape[:-1], nfreq)


def _transpose_fwd(xf: jax.Array, axis_name: str, p: int) -> jax.Array:
    """[..., H/P, M_pad] -> [..., H, M_pad/P] (shard m, gather lat)."""
    m_loc = xf.shape[-1] // p
    xf = xf.reshape(*xf.shape[:-1], p, m_loc)
    xf = jnp.moveaxis(xf, -2, 0)
    xf = lax.all_to_all(xf, axis_name, split_axis=0, concat_axis=0, tiled=True)
    return jnp.concatenate([xf[i] for i in range(p)], axis=-2)


def _transpose_bwd(xf: jax.Array, axis_name: str, p: int) -> jax.Array:
    """[..., H, M_pad/P] -> [..., H/P, M_pad] (shard lat, gather m)."""
    h_loc = xf.shape[-2] // p
    xf = xf.reshape(*xf.shape[:-2], p, h_loc, xf.shape[-1])
    xf = jnp.moveaxis(xf, -3, 0)
    xf = lax.all_to_all(xf, axis_name, split_axis=0, concat_axis=0, tiled=True)
    return jnp.concatenate([xf[i] for i in range(p)], axis=-1)


def dist_sht(
    f_local: jax.Array, tables: SHTTables, axis_name: str
) -> jax.Array:
    """[..., nlat/P, nlon] real -> [..., lmax, M_pad/P] complex."""
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    m_pad = -(-tables.mmax // p) * p
    X = _vma_safe_rfft(f_local.astype(jnp.float32), tables.mmax)
    X = jnp.pad(X, [(0, 0)] * (X.ndim - 1) + [(0, m_pad - tables.mmax)])
    X = _transpose_fwd(X, axis_name, p)  # [..., nlat, M_pad/P]

    fwd = jnp.asarray(tables.fwd)  # [mmax, nlat, lmax]
    fwd = jnp.pad(fwd, [(0, m_pad - tables.mmax), (0, 0), (0, 0)])
    m_loc = m_pad // p
    fwd_loc = lax.dynamic_slice_in_dim(fwd, idx * m_loc, m_loc, axis=0)
    # a[..., l, m_loc] = sum_j X[..., j, m_loc] * fwd_loc[m_loc, j, l]
    return jnp.einsum("...jm,mjl->...lm", X, fwd_loc.astype(X.dtype))


def dist_isht(
    a_local: jax.Array, tables: SHTTables, axis_name: str
) -> jax.Array:
    """[..., lmax, M_pad/P] complex -> [..., nlat/P, nlon] real."""
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    m_pad = -(-tables.mmax // p) * p
    m_loc = m_pad // p

    inv = jnp.asarray(tables.inv)  # [mmax, lmax, nlat]
    inv = jnp.pad(inv, [(0, m_pad - tables.mmax), (0, 0), (0, 0)])
    inv_loc = lax.dynamic_slice_in_dim(inv, idx * m_loc, m_loc, axis=0)
    X = jnp.einsum("...lm,mlj->...jm", a_local, inv_loc.astype(a_local.dtype))
    X = _transpose_bwd(X, axis_name, p)  # [..., nlat/P, M_pad]
    nfreq = tables.nlon // 2 + 1
    X = X[..., : tables.mmax]
    X = jnp.pad(X, [(0, 0)] * (X.ndim - 1) + [(0, nfreq - tables.mmax)])
    return jnp.fft.irfft(X, n=tables.nlon, axis=-1, norm="forward")


def make_dist_sht(mesh: Mesh, tables: SHTTables, ndim: int = 2, axis_name: str = "x"):
    """(sht, isht) over globally sharded arrays: fields sharded on latitude,
    coefficients sharded on m."""
    from jax import shard_map

    lead = [None] * (ndim - 2)
    fwd = shard_map(
        functools.partial(dist_sht, tables=tables, axis_name=axis_name),
        mesh=mesh,
        in_specs=P(*lead, axis_name, None),
        out_specs=P(*lead, None, axis_name),

    )
    inv = shard_map(
        functools.partial(dist_isht, tables=tables, axis_name=axis_name),
        mesh=mesh,
        in_specs=P(*lead, None, axis_name),
        out_specs=P(*lead, axis_name, None),

    )
    return fwd, inv
