"""Boundary-condition padding ops for global grids.

TPU-first designs of the reference's two padding layers:

- `cylinder_pad` — circular in longitude, zero in latitude (reference
  `utils/utils.py:11-26` CylinderPad).  Expressed as pure `jnp` slicing so XLA
  fuses it into the consuming convolution.
- `healpix_pad` — neighbor-aware padding of the 12 HEALPix faces.  The
  reference assembles each face from its neighbors with 12-way cat/rot90
  (`utils/healpix.py:193-313`); here the whole operation is ONE precomputed
  gather + weighted sum (see `grids.healpix.build_pad_indices`), which XLA
  lowers to a single fused dynamic-gather — no per-face op soup, and the
  tables are reused across every layer/step of a rollout.

Data layout note: these ops are layout-polymorphic over leading batch/channel
dims; spatial dims are the trailing [H, W] (or [F, H, W] for HEALPix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dlwpbench_tpu.grids import healpix as hpx_geom


def cylinder_pad(x: jax.Array, padding: int) -> jax.Array:
    """Circular pad in longitude (last axis), zero pad in latitude (axis -2)."""
    p = padding
    if p == 0:
        return x
    x = jnp.concatenate([x[..., -p:], x, x[..., :p]], axis=-1)
    pad_cfg = [(0, 0)] * (x.ndim - 2) + [(p, p), (0, 0)]
    return jnp.pad(x, pad_cfg)


@functools.lru_cache(maxsize=None)
def _pad_tables(nside: int, padding: int):
    # Cache NUMPY arrays (never jnp): a jnp array created under a jit trace
    # would cache a tracer and leak it into later traces.
    idx, w = hpx_geom.build_pad_indices(nside, padding)
    return idx.reshape(-1), w


def healpix_pad(x: jax.Array, padding: int) -> jax.Array:
    """Neighbor-pad a HEALPix field.

    Args:
      x: [..., F=12, H, W] field (H == W == nside).
      padding: pad width p >= 1.

    Returns:
      [..., 12, H+2p, W+2p] padded field, matching the reference's
      HEALPixPadding output bit-for-bit (same neighbor/rotation/corner rules).
    """
    *lead, F, H, W = x.shape
    assert F == 12 and H == W, f"expected [..., 12, n, n], got {x.shape}"
    idx_flat, w = _pad_tables(H, padding)
    flat = x.reshape(*lead, F * H * W)
    gathered = jnp.take(flat, jnp.asarray(idx_flat), axis=-1)
    gathered = gathered.reshape(*lead, *w.shape)
    return (gathered * jnp.asarray(w, x.dtype)).sum(-1)


def healpix_pad_channels_last(x: jax.Array, padding: int) -> jax.Array:
    """Neighbor-pad a channels-last HEALPix field.

    Args:
      x: [B, F=12, H, W, C] field (H == W == nside).
      padding: pad width p >= 1.

    Returns:
      [B, 12, H+2p, W+2p, C].  Channels stay the trailing (lane) dim so the
      gather vectorizes across C on the VPU and feeds NHWC convs directly.
    """
    B, F, H, W, C = x.shape
    assert F == 12 and H == W, f"expected [B, 12, n, n, C], got {x.shape}"
    idx_flat, w = _pad_tables(H, padding)
    flat = x.reshape(B, F * H * W, C)
    gathered = jnp.take(flat, jnp.asarray(idx_flat), axis=1)  # [B, 12*Hp*Wp*2, C]
    gathered = gathered.reshape(B, *w.shape, C)  # [B, 12, Hp, Wp, 2, C]
    return (gathered * jnp.asarray(w, x.dtype)[..., None]).sum(-2)
