"""SFNO — Spherical Fourier Neural Operator on the from-scratch SHT.

Reference: `models/fno/fno.py:149-259` wraps torch-harmonics'
`SphericalFourierNeuralOperatorNet` (config `configs/model/sfno.yaml`:
equiangular grid, embed_dim 256, num_layers 4, scale_factor 1,
operator_type "driscoll-healy", big_skip, pos_embed, use_mlp,
no normalization).  Architecture reproduced here:

    encoder: 1x1 Dense(embed) -> gelu -> Dense(embed)  (+ pos embed)
    num_layers x block:
        y = ISHT( W_l . SHT(x) ) + Dense_skip(x); x = gelu(y)
        x = x + MLP(x)                      (use_mlp)
    big skip: concat encoder input; decoder: Dense -> gelu -> Dense(out)

"driscoll-healy" operator: the spectral weight is diagonal in (l, m) and
shared across m — W[l] contracts channels only (an isotropic spherical
convolution).  The contraction is a single real einsum pair on the MXU.

The SHT itself is `ops/sht.py` (least-squares analysis on equiangular
grids — exact bandlimited round trip, see that module).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dlwpbench_tpu.models.base import RolloutModel
from dlwpbench_tpu.ops.sht import isht, isht_real, sht, sht_real, sht_tables


class SphericalConv(nn.Module):
    """Driscoll-Healy spherical convolution: per-degree channel mixing.

    With `spmd_mesh` set, the SHT pair runs distributed over mesh axis
    `dist_axis` (`parallel/sht_dist.py`: latitude-sharded fields, m-sharded
    coefficients) so the model's spectral transforms scale across chips —
    the per-degree contraction is m-parallel and needs no collective.
    """

    features: int
    nlat: int
    nlon: int
    grid: str = "equiangular"
    lmax: int | None = None
    mmax: int | None = None
    spmd_mesh: Any = None
    dist_axis: str = "x"
    # distributed-schedule knobs (parallel/sht_dist.py): channel chunks
    # whose transposes overlap the Legendre contractions (numerics
    # identical), and bf16 transpose payloads (half the ICI bytes; one
    # rounding of the spectral coefficients).  "auto" follows the
    # activation dtype — under the trainer's bf16 recipe the fields are
    # already bf16, so shipping bf16 payloads adds no precision loss the
    # training run has not accepted; fp32 runs keep fp32 transposes.
    dist_pipeline_chunks: int = 4
    dist_comm_bf16: Any = "auto"
    # "matmul" (default, single-device): SHT pair with the longitude DFT as
    # real einsums — the whole spherical conv lowers to MXU matmuls, no
    # complex dtype and no XLA FFT op (overhead-bound at weather-grid
    # sizes).  "fft": jnp.fft path (always used when spmd_mesh is set).
    fft_impl: str = "matmul"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, H, W, C]
        B, H, W, Cin = x.shape
        t = sht_tables(self.nlat, self.nlon, self.lmax, self.mmax, self.grid)
        scale = 1.0 / np.sqrt(Cin * self.features)
        w = self.param(
            "weight",
            lambda k: scale * jax.random.normal(k, (Cin, self.features, t.lmax, 2)),
        )
        if self.spmd_mesh is None and self.fft_impl == "matmul":
            ar, ai = sht_real(jnp.moveaxis(x, -1, 1), t)  # [B, C, l, m]
            wr, wi = w[..., 0], w[..., 1]
            # Four separate per-degree einsums, NOT a packed [2C, 2C]
            # block GEMM: packing measured 1.4x SLOWER at the 64M/128M
            # rungs — the [[wr, wi], [-wi, wr]] weight materializes a 4x
            # tensor (231 MB at 128M params) whose HBM traffic (and
            # concat-transpose gradient) outweighs the saved op dispatches.
            our = jnp.einsum("bilm,iol->bolm", ar, wr) - jnp.einsum(
                "bilm,iol->bolm", ai, wi
            )
            oui = jnp.einsum("bilm,iol->bolm", ar, wi) + jnp.einsum(
                "bilm,iol->bolm", ai, wr
            )
            y = isht_real(our, oui, t)  # [B, Cout, H, W]
            return jnp.moveaxis(y, 1, -1).astype(x.dtype)
        if self.spmd_mesh is not None:
            from dlwpbench_tpu.parallel.sht_dist import make_dist_sht

            bf16_comm = (
                self.dist_comm_bf16 is True
                or (self.dist_comm_bf16 == "auto"
                    and x.dtype == jnp.bfloat16)
            )
            fwd, inv = make_dist_sht(
                self.spmd_mesh, t, ndim=4, axis_name=self.dist_axis,
                pipeline_chunks=self.dist_pipeline_chunks,
                comm_dtype=jnp.bfloat16 if bf16_comm else None,
            )
        else:
            fwd = lambda f: sht(f, t)
            inv = lambda a: isht(a, t)
        a = fwd(jnp.moveaxis(x, -1, 1))  # [B, C, l, m] complex
        wc = (w[..., 0] + 1j * w[..., 1]).astype(a.dtype)
        out = jnp.einsum("bilm,iol->bolm", a, wc)
        y = inv(out)  # [B, Cout, H, W]
        return jnp.moveaxis(y, 1, -1).astype(x.dtype)


class SFNO2DModule(RolloutModel):
    """Reference `SFNO2DModule` (config `type: SFNO2DModule`)."""

    name: str = "sfno2d"
    constant_channels: int = 4
    prescribed_channels: int = 1
    prognostic_channels: int = 8
    grid: str = "equiangular"
    num_layers: int = 4
    scale_factor: int = 1
    embed_dim: int = 256
    operator_type: str = "driscoll-healy"
    context_size: int = 1
    height: int = 32
    width: int = 64
    hard_thresholding_fraction: float = 1.0
    rank: float = 1.0
    big_skip: bool = True
    pos_embed: bool = True
    use_mlp: bool = True
    mesh: str = "equirectangular"
    spmd_mesh: Any = None  # jax Mesh: distribute the SHTs over `dist_axis`
    dist_axis: str = "x"
    fft_impl: str = "matmul"  # see SphericalConv.fft_impl
    # "per_conv": each SphericalConv runs its own distributed SHT pair
    # (the default; parameter tree identical to the single-device model).
    # "fused": the whole block stack runs as one chunk-pipelined
    # shard_map region (`parallel/spectral_dist.py:dist_sfno_blocks`) in
    # which every transpose overlaps the blocks' pointwise compute —
    # the batch-1 strong-scaling deployment schedule.  Requires
    # `use_mlp`; the fused region owns its parameters (`blocks_*`), so
    # checkpoints are schedule-specific.
    dist_schedule: str = "per_conv"
    dist_pipeline_chunks: int = 8   # fused-schedule channel chunks
    dist_comm_bf16: Any = "auto"    # see SphericalConv.dist_comm_bf16

    @nn.compact
    def step(self, x: jax.Array, state: Any) -> tuple[jax.Array, Any]:
        B, H, W, Cin = x.shape
        D = self.embed_dim
        lmax = max(
            1,
            int((H // max(1, self.scale_factor)) * self.hard_thresholding_fraction),
        )

        inp = x
        x = nn.Dense(D)(x)
        x = nn.gelu(x)
        x = nn.Dense(D)(x)
        if self.pos_embed:
            pos = self.param(
                "pos_embed", nn.initializers.zeros, (1, H, W, D)
            )
            x = x + pos

        if self.dist_schedule not in ("per_conv", "fused"):
            raise ValueError(
                f"dist_schedule={self.dist_schedule!r}: expected 'per_conv' or "
                "'fused' (the two schedules have different parameter trees, so "
                "a silent fallback would train a different model)"
            )
        if self.spmd_mesh is not None and self.dist_schedule == "fused":
            x = self._fused_blocks(x, lmax)
        else:
            for _ in range(self.num_layers):
                y = SphericalConv(
                    D, nlat=H, nlon=W, grid=self.grid, lmax=lmax,
                    spmd_mesh=self.spmd_mesh, dist_axis=self.dist_axis,
                    fft_impl=self.fft_impl,
                    dist_pipeline_chunks=self.dist_pipeline_chunks,
                    dist_comm_bf16=self.dist_comm_bf16,
                )(x)
                y = y + nn.Dense(D)(x)  # inner skip
                x = nn.gelu(y)
                if self.use_mlp:
                    h = nn.Dense(2 * D)(x)
                    h = nn.gelu(h)
                    x = x + nn.Dense(D)(h)

        if self.big_skip:
            x = jnp.concatenate([x, inp], axis=-1)
        x = nn.Dense(D)(x)
        x = nn.gelu(x)
        out = nn.Dense(self.prognostic_channels)(x)
        return out, state

    def _fused_blocks(self, x: jax.Array, lmax: int) -> jax.Array:
        """Chunk-pipelined block stack (`dist_schedule="fused"`): same math
        as the per-layer loop, scheduled so every SHT transpose overlaps
        pointwise compute (`parallel/spectral_dist.py:dist_sfno_blocks`)."""
        import functools

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from dlwpbench_tpu.parallel.spectral_dist import dist_sfno_blocks

        assert self.use_mlp, "fused schedule covers the use_mlp block form"
        B, H, W, D = x.shape
        t = sht_tables(H, W, lmax, None, self.grid)
        scale = 1.0 / np.sqrt(D * D)
        lecun = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        layers = []
        for i in range(self.num_layers):
            layers.append({
                "spec": self.param(
                    f"blocks_{i}_spec",
                    lambda k, s=scale: s
                    * jax.random.normal(k, (D, D, t.lmax, 2)),
                ),
                "skip_k": self.param(f"blocks_{i}_skip_kernel", lecun, (D, D)),
                "skip_b": self.param(f"blocks_{i}_skip_bias", zeros, (D,)),
                "mlp1_k": self.param(
                    f"blocks_{i}_mlp1_kernel", lecun, (D, 2 * D)
                ),
                "mlp1_b": self.param(f"blocks_{i}_mlp1_bias", zeros, (2 * D,)),
                "mlp2_k": self.param(
                    f"blocks_{i}_mlp2_kernel", lecun, (2 * D, D)
                ),
                "mlp2_b": self.param(f"blocks_{i}_mlp2_bias", zeros, (D,)),
            })
        bf16_comm = self.dist_comm_bf16 is True or (
            self.dist_comm_bf16 == "auto" and x.dtype == jnp.bfloat16
        )
        fn = shard_map(
            functools.partial(
                dist_sfno_blocks,
                tables=t,
                axis_name=self.dist_axis,
                pipeline_chunks=self.dist_pipeline_chunks,
                comm_dtype=jnp.bfloat16 if bf16_comm else None,
            ),
            mesh=self.spmd_mesh,
            in_specs=(P(None, self.dist_axis, None, None), P()),
            out_specs=P(None, self.dist_axis, None, None),
        )
        return fn(x, layers)

