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

Schedule (round 4): the plain schedule serializes transpose -> contraction,
so at 8+ chips the exposed all_to_all time caps efficiency near 60%
(results/scaling_model.json, round 3).  Two levers close that gap:

- `pipeline_chunks=K` splits the channel axis into K chunks; chunk k's
  all_to_all is independent of chunk k-1's Legendre contraction, so XLA's
  latency-hiding scheduler overlaps them (the standard double-buffered
  transpose pipeline; only ~1/K of the comm is exposed at the pipeline
  head/tail).  Identical numerics — chunking the channel axis commutes
  with both the transpose and the per-channel contraction.
- `comm_dtype=jnp.bfloat16` ships the transposed coefficients as stacked
  bf16 real pairs (half the bytes over ICI).  The Legendre contraction
  still accumulates in fp32; only the transpose payload rounds once,
  matching bf16-default training precision.
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


def _a2a(xf: jax.Array, axis_name: str, comm_dtype) -> jax.Array:
    """all_to_all along axis 0, optionally shipping bf16 real pairs."""
    if comm_dtype is not None and xf.dtype.kind == "c":
        pair = jnp.stack([xf.real, xf.imag], axis=-1).astype(comm_dtype)
        pair = lax.all_to_all(
            pair, axis_name, split_axis=0, concat_axis=0, tiled=True
        )
        pair = pair.astype(jnp.float32)
        return lax.complex(pair[..., 0], pair[..., 1])
    return lax.all_to_all(
        xf, axis_name, split_axis=0, concat_axis=0, tiled=True
    )


def _transpose_fwd(
    xf: jax.Array, axis_name: str, p: int, comm_dtype=None
) -> jax.Array:
    """[..., H/P, M_pad] -> [..., H, M_pad/P] (shard m, gather lat)."""
    m_loc = xf.shape[-1] // p
    xf = xf.reshape(*xf.shape[:-1], p, m_loc)
    xf = jnp.moveaxis(xf, -2, 0)
    xf = _a2a(xf, axis_name, comm_dtype)
    return jnp.concatenate([xf[i] for i in range(p)], axis=-2)


def _transpose_bwd(
    xf: jax.Array, axis_name: str, p: int, comm_dtype=None
) -> jax.Array:
    """[..., H, M_pad/P] -> [..., H/P, M_pad] (shard lat, gather m)."""
    h_loc = xf.shape[-2] // p
    xf = xf.reshape(*xf.shape[:-2], p, h_loc, xf.shape[-1])
    xf = jnp.moveaxis(xf, -3, 0)
    xf = _a2a(xf, axis_name, comm_dtype)
    return jnp.concatenate([xf[i] for i in range(p)], axis=-1)


def _chunk_starts(size: int, k: int) -> list[tuple[int, int]]:
    """(start, length) pairs splitting `size` into <=k near-equal chunks."""
    k = max(1, min(k, size))
    base, rem = divmod(size, k)
    out, s = [], 0
    for i in range(k):
        n = base + (1 if i < rem else 0)
        out.append((s, n))
        s += n
    return out


def dist_sht(
    f_local: jax.Array,
    tables: SHTTables,
    axis_name: str,
    pipeline_chunks: int = 1,
    comm_dtype=None,
) -> jax.Array:
    """[..., nlat/P, nlon] real -> [..., lmax, M_pad/P] complex.

    `pipeline_chunks>1` splits the axis at -3 (channels in the SFNO layout
    [..., C, nlat/P, nlon]) so each chunk's transpose overlaps the previous
    chunk's Legendre contraction; `comm_dtype` (e.g. bf16) halves the
    transpose payload.  Both default off == the round-3 schedule.
    """
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    m_pad = -(-tables.mmax // p) * p
    m_loc = m_pad // p

    fwd = jnp.asarray(tables.fwd)  # [mmax, nlat, lmax]
    fwd = jnp.pad(fwd, [(0, m_pad - tables.mmax), (0, 0), (0, 0)])
    fwd_loc = lax.dynamic_slice_in_dim(fwd, idx * m_loc, m_loc, axis=0)

    def one(f_chunk):
        X = _vma_safe_rfft(f_chunk.astype(jnp.float32), tables.mmax)
        X = jnp.pad(X, [(0, 0)] * (X.ndim - 1) + [(0, m_pad - tables.mmax)])
        return _transpose_fwd(X, axis_name, p, comm_dtype)

    def legendre(X):
        # a[..., l, m_loc] = sum_j X[..., j, m_loc] * fwd_loc[m_loc, j, l]
        return jnp.einsum("...jm,mjl->...lm", X, fwd_loc.astype(X.dtype))

    if pipeline_chunks <= 1 or f_local.ndim < 3:
        return legendre(one(f_local))
    # software pipeline over the channel axis: emit every chunk's
    # rfft+all_to_all before any Legendre einsum — only the chunkwise
    # data dependency remains, so the latency-hiding scheduler can run
    # all_to_all(k+1..) while contracting chunk k.
    chunks = _chunk_starts(f_local.shape[-3], pipeline_chunks)
    gathered = [
        one(lax.slice_in_dim(f_local, s, s + n, axis=-3)) for s, n in chunks
    ]
    return jnp.concatenate([legendre(X) for X in gathered], axis=-3)


def dist_isht(
    a_local: jax.Array,
    tables: SHTTables,
    axis_name: str,
    pipeline_chunks: int = 1,
    comm_dtype=None,
) -> jax.Array:
    """[..., lmax, M_pad/P] complex -> [..., nlat/P, nlon] real.

    Pipelining mirrors `dist_sht`: per channel chunk, the synthesis einsum
    of chunk k+1 overlaps the transpose of chunk k.
    """
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    m_pad = -(-tables.mmax // p) * p
    m_loc = m_pad // p

    inv = jnp.asarray(tables.inv)  # [mmax, lmax, nlat]
    inv = jnp.pad(inv, [(0, m_pad - tables.mmax), (0, 0), (0, 0)])
    inv_loc = lax.dynamic_slice_in_dim(inv, idx * m_loc, m_loc, axis=0)

    def synth(a_chunk):
        return jnp.einsum(
            "...lm,mlj->...jm", a_chunk, inv_loc.astype(a_chunk.dtype)
        )

    def back(X):
        X = _transpose_bwd(X, axis_name, p, comm_dtype)
        nfreq = tables.nlon // 2 + 1
        X = X[..., : tables.mmax]
        X = jnp.pad(X, [(0, 0)] * (X.ndim - 1) + [(0, nfreq - tables.mmax)])
        # rank-2 flatten: rank>2 complex FFTs hang the axon relay compiler
        # (same guard as `_vma_safe_rfft`); identical math.
        shape = X.shape
        out = jnp.fft.irfft(
            X.reshape(-1, nfreq), n=tables.nlon, axis=-1, norm="forward"
        )
        return out.reshape(*shape[:-1], tables.nlon)

    if pipeline_chunks <= 1 or a_local.ndim < 3:
        return back(synth(a_local))
    chunks = _chunk_starts(a_local.shape[-3], pipeline_chunks)
    synthed = [
        synth(lax.slice_in_dim(a_local, s, s + n, axis=-3)) for s, n in chunks
    ]
    return jnp.concatenate([back(X) for X in synthed], axis=-3)


def make_dist_sht(
    mesh: Mesh,
    tables: SHTTables,
    ndim: int = 2,
    axis_name: str = "x",
    pipeline_chunks: int = 1,
    comm_dtype=None,
):
    """(sht, isht) over globally sharded arrays: fields sharded on latitude,
    coefficients sharded on m.  `pipeline_chunks`/`comm_dtype` select the
    overlapped / half-precision transpose schedule (see module docstring)."""
    from jax import shard_map

    lead = [None] * (ndim - 2)
    fwd = shard_map(
        functools.partial(
            dist_sht, tables=tables, axis_name=axis_name,
            pipeline_chunks=pipeline_chunks, comm_dtype=comm_dtype,
        ),
        mesh=mesh,
        in_specs=P(*lead, axis_name, None),
        out_specs=P(*lead, None, axis_name),

    )
    inv = shard_map(
        functools.partial(
            dist_isht, tables=tables, axis_name=axis_name,
            pipeline_chunks=pipeline_chunks, comm_dtype=comm_dtype,
        ),
        mesh=mesh,
        in_specs=P(*lead, None, axis_name),
        out_specs=P(*lead, axis_name, None),

    )
    return fwd, inv
