"""FourCastNet (AFNONet) — reference `models/fourcastnet/fourcastnet.py:214-361`.

ViT-style architecture on the lat-lon grid:
- PatchEmbed: conv k=patch, s=patch -> [B, h*w, D] tokens (+ learnable pos
  embed, trunc-normal 0.02) (`:530-543,285-287`);
- depth x Block: norm -> filter (AFNO2D freq-MLP or FNO mixer) -> residual,
  norm -> MLP(mlp_ratio) -> residual (double skip) (`:156-193`);
- LayerNorm -> Linear head -> patch reassembly to [B, Cq, H, W] (`:349-357`);
- rollout/residual semantics from `RolloutModel`.

Config parity: `configs/model/fourcastnet.yaml` (patch 1x1..4x4, embed_dim,
depth, num_blocks, sparsity_threshold, hard_thresholding_fraction).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dlwpbench_tpu.models.base import RolloutModel
from dlwpbench_tpu.ops.spectral import AFNO2DFilter


def trunc_normal_init(std: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


class Mlp(nn.Module):
    hidden: int
    out: int
    # tanh-approx GELU by default (erf costs 2x on the VPU); parity tests
    # set approximate=False to match torch.nn.GELU exactly.
    approximate: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=trunc_normal_init())(x)
        x = nn.gelu(x, approximate=self.approximate)
        return nn.Dense(self.out, kernel_init=trunc_normal_init())(x)


class AFNOBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    num_blocks: int = 8
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0
    filter_type: str = "AFNO2D"
    n_modes: Sequence[int] = (12, 12)
    spmd_mesh: Any = None  # jax Mesh: distribute the filter's transforms
    dist_axis: str = "x"
    exact_gelu: bool = False
    fft_impl: str = "matmul"  # "matmul" (MXU DFT) | "fft" (jnp.fft)

    @nn.compact
    def __call__(self, x):
        # x: [B, h, w, D] token grid
        residual = x
        y = nn.LayerNorm(epsilon=1e-6)(x)
        if self.filter_type == "AFNO2D":
            y = AFNO2DFilter(
                hidden_size=self.dim,
                num_blocks=self.num_blocks,
                sparsity_threshold=self.sparsity_threshold,
                hard_thresholding_fraction=self.hard_thresholding_fraction,
                spmd_mesh=self.spmd_mesh,
                dist_axis=self.dist_axis,
                fft_impl=self.fft_impl,
            )(y)
        elif self.filter_type == "SFNO":
            # FourCastNetv2 (reference `fourcastnet.py:364-527`): the mixer is
            # a spherical convolution on the token grid via the from-scratch
            # SHT (replacing torch-harmonics SFNO).
            from dlwpbench_tpu.models.sfno import SphericalConv

            h, w = y.shape[1], y.shape[2]
            y = y + SphericalConv(
                self.dim, nlat=h, nlon=w,
                spmd_mesh=self.spmd_mesh, dist_axis=self.dist_axis,
            )(y)
        elif self.filter_type == "FNO2D":
            # the reference's FNO-mixer variant (`fourcastnet.py:130-153`)
            from dlwpbench_tpu.models.fno import FNOCore

            y = y + FNOCore(
                hidden_channels=self.dim,
                out_channels=self.dim,
                lifting_channels=self.dim,
                projection_channels=self.dim,
                n_modes=tuple(self.n_modes),
                n_layers=1,
            )(y)
        else:
            raise ValueError(f"unknown filter {self.filter_type!r}")
        # double skip
        x = y + residual
        residual = x
        y = nn.LayerNorm(epsilon=1e-6)(x)
        y = Mlp(
            int(self.dim * self.mlp_ratio), self.dim,
            approximate=not self.exact_gelu,
        )(y)
        return y + residual


class FourCastNet(RolloutModel):
    """AFNONet (config `type: FourCastNet`); `filter="SFNO"` gives the
    FourCastNetv2 variant (SFNO mixer, reference `fourcastnet.py:364-527`)."""

    name: str = "fourcastnet"
    img_height: int = 32
    img_width: int = 64
    patch_size: Sequence[int] = (1, 1)
    constant_channels: int = 4
    prescribed_channels: int = 0
    prognostic_channels: int = 1
    filter: str = "AFNO2D"
    embed_dim: int = 768
    depth: int = 12
    mlp_ratio: float = 4.0
    num_blocks: int = 16
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0
    context_size: int = 1
    use_pos_embed: bool = True
    n_modes: Sequence[int] = (12, 12)
    mesh: str = "equirectangular"
    spmd_mesh: Any = None  # jax Mesh: distribute the spectral filters
    dist_axis: str = "x"
    # False = fast tanh-approx GELU; True = torch-exact erf GELU (parity)
    exact_gelu: bool = False
    fft_impl: str = "matmul"  # AFNO spectrum: "matmul" (MXU DFT) | "fft"

    @nn.compact
    def step(self, x: jax.Array, state: Any) -> tuple[jax.Array, Any]:
        B, H, W, Cin = x.shape
        ph, pw = self.patch_size
        h, w = H // ph, W // pw
        D = self.embed_dim

        # PatchEmbed: conv k=patch s=patch (`fourcastnet.py:530-543`)
        x = nn.Conv(D, (ph, pw), strides=(ph, pw), padding="VALID")(x)  # [B,h,w,D]
        if self.use_pos_embed:
            pos = self.param("pos_embed", trunc_normal_init(), (1, h, w, D))
            x = x + pos

        for _ in range(self.depth):
            x = AFNOBlock(
                dim=D,
                mlp_ratio=self.mlp_ratio,
                num_blocks=self.num_blocks,
                exact_gelu=self.exact_gelu,
                sparsity_threshold=self.sparsity_threshold,
                hard_thresholding_fraction=self.hard_thresholding_fraction,
                filter_type=self.filter,
                n_modes=tuple(self.n_modes),
                spmd_mesh=self.spmd_mesh,
                dist_axis=self.dist_axis,
                fft_impl=self.fft_impl,
            )(x)

        # NOTE: the reference defines a final LayerNorm but never applies it
        # before the head (`fourcastnet.py:283-293,349`); match that behavior.
        x = nn.Dense(
            self.prognostic_channels * ph * pw,
            use_bias=False,
            kernel_init=trunc_normal_init(),
        )(x)  # [B, h, w, Cq*ph*pw]
        # patch reassembly -> [B, H, W, Cq]
        x = x.reshape(B, h, w, ph, pw, self.prognostic_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, self.prognostic_channels)
        return x, state
