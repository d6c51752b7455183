"""Classic U-Net (and HEALPix variant) — reference `models/unet/unet.py:274-557`.

Topology facts reproduced (channels-last, TPU NHWC):
- encoder: per level, AvgPool 2x downsample (except top), `n_convolutions`
  3x3 geo-padded convs + activation; bottom level runs n_convolutions//2
  (`unet.py:452-470`).
- decoder: skip-concat from encoder (except bottom), n_convolutions convs
  (bottom: half), ConvTranspose2d k2 s2 upsample between levels, final 1x1
  head (`unet.py:507-556`).
- rollout/residual semantics from `RolloutModel` (see base.py).

The HEALPix variant ("UNetHPX") is the same network with mesh="healpix":
every conv pads via the neighbor-gather tables and runs on the 12 faces
folded into the batch dim (reference folds once globally, `unet.py:413-426`;
we fold around each conv which is equivalent and keeps pooling trivial).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dlwpbench_tpu.models.base import RolloutModel
from dlwpbench_tpu.ops.conv import (
    GeoConv,
    GeoConvTranspose,
    avg_pool_2x,
    get_activation,
)


class UNet(RolloutModel):
    """U-Net weather emulator (reference `UNet`, config `model/unet.yaml`)."""

    name: str = "unet"
    constant_channels: int = 4
    prescribed_channels: int = 0
    prognostic_channels: int = 1
    hidden_channels: Sequence[int] = (8, 16, 32)
    n_convolutions: int = 2
    activation: str = "gelu"
    context_size: int = 1
    mesh: str = "equirectangular"

    @nn.compact
    def step(self, x: jax.Array, state: Any) -> tuple[jax.Array, Any]:
        act = get_activation(self.activation)
        hc = tuple(self.hidden_channels)
        n_levels = len(hc)

        # --- encoder ---
        skips = []
        for lvl, ch in enumerate(hc):
            if lvl > 0:
                if self.mesh != "healpix" and (
                    x.shape[1] % 2 or x.shape[2] % 2
                ):
                    # odd grid (e.g. 2.0-degree 90x180): edge-replicate one
                    # row/col so pooling halves exactly; the decoder crops
                    # back to the skip's shape after upsampling.
                    x = jnp.pad(
                        x,
                        ((0, 0), (0, x.shape[1] % 2), (0, x.shape[2] % 2), (0, 0)),
                        mode="edge",
                    )
                x = avg_pool_2x(x, self.mesh)
            n_convs = (
                self.n_convolutions // 2 if lvl == n_levels - 1 else self.n_convolutions
            )
            for _ in range(n_convs):
                x = act(GeoConv(ch, 3, mesh=self.mesh)(x))
            skips.append(x)

        # --- decoder ---
        rev = hc[::-1]
        for i, ch in enumerate(rev):
            if i > 0:
                skip = skips[n_levels - 1 - i]
                if self.mesh != "healpix" and x.shape[1:3] != skip.shape[1:3]:
                    x = x[:, : skip.shape[1], : skip.shape[2]]
                x = jnp.concatenate([skip, x], axis=-1)
            n_convs = self.n_convolutions // 2 if i == 0 else self.n_convolutions
            for _ in range(n_convs):
                x = act(GeoConv(ch, 3, mesh=self.mesh)(x))
            if i < n_levels - 1:
                x = GeoConvTranspose(rev[i + 1], 2, 2, mesh=self.mesh)(x)

        out = GeoConv(self.prognostic_channels, 1, mesh=self.mesh)(x)
        return out, state


class UNetHPX(UNet):
    """HEALPix U-Net (reference `UNetHPX`, `unet.py:332-426`)."""

    mesh: str = "healpix"
