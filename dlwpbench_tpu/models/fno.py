"""FNO2D / TFNO2D weather emulators — reference `models/fno/fno.py:12-147`.

The reference wraps neuraloperator's `FNO`/`TFNO` (config
`configs/model/fno.yaml`: n_modes [12,12], hidden 32, lifting/projection 256,
n_layers 4, tucker rank 0.8) inside the shared rollout convention.  Here the
operator itself is first-party JAX (see `ops/spectral.py`):

    lifting: Linear(in->lifting) -> gelu -> Linear(lifting->hidden)
    n_layers x [ SpectralConv2d + 1x1 linear skip, gelu between layers ]
    projection: Linear(hidden->projection) -> gelu -> Linear(->out)

TFNO2DModule = same with Tucker-factorized spectral weights.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
from flax import linen as nn

from dlwpbench_tpu.models.base import RolloutModel
from dlwpbench_tpu.ops.spectral import SpectralConv2d


class FNOCore(nn.Module):
    hidden_channels: int
    out_channels: int
    lifting_channels: int = 256
    projection_channels: int = 256
    n_modes: Sequence[int] = (12, 12)
    n_layers: int = 4
    tucker_rank: float | None = None
    use_bias: bool = True
    fft_impl: str = "matmul"  # see SpectralConv2d.fft_impl

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, H, W, Cin]
        x = nn.Dense(self.lifting_channels)(x)
        x = nn.gelu(x)
        x = nn.Dense(self.hidden_channels)(x)
        for i in range(self.n_layers):
            y = SpectralConv2d(
                self.hidden_channels,
                modes1=int(self.n_modes[0]),
                modes2=int(self.n_modes[1]),
                tucker_rank=self.tucker_rank,
                fft_impl=self.fft_impl,
            )(x)
            y = y + nn.Dense(self.hidden_channels, use_bias=self.use_bias)(x)
            x = nn.gelu(y) if i < self.n_layers - 1 else y
        x = nn.Dense(self.projection_channels)(x)
        x = nn.gelu(x)
        return nn.Dense(self.out_channels)(x)


class FNO2DModule(RolloutModel):
    """Reference `FNO2DModule` (full spectral weights)."""

    name: str = "fno2d"
    constant_channels: int = 4
    prescribed_channels: int = 0
    prognostic_channels: int = 1
    hidden_channels: int = 32
    lifting_channels: int = 256
    projection_channels: int = 256
    n_modes: Sequence[int] = (12, 12)
    n_layers: int = 4
    rank: float = 0.8
    bias: bool = True
    context_size: int = 1
    mesh: str = "equirectangular"
    fft_impl: str = "matmul"  # see SpectralConv2d.fft_impl
    _tucker: bool = False

    @nn.compact
    def step(self, x: jax.Array, state: Any) -> tuple[jax.Array, Any]:
        out = FNOCore(
            hidden_channels=self.hidden_channels,
            out_channels=self.prognostic_channels,
            lifting_channels=self.lifting_channels,
            projection_channels=self.projection_channels,
            n_modes=tuple(self.n_modes),
            n_layers=self.n_layers,
            tucker_rank=self.rank if self._tucker else None,
            use_bias=self.bias,
            fft_impl=self.fft_impl,
        )(x)
        return out, state


class TFNO2DModule(FNO2DModule):
    """Reference `TFNO2DModule` (Tucker-factorized spectral weights)."""

    name: str = "tfno2d"
    _tucker: bool = True
