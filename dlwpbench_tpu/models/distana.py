"""DISTANA — DIStributed spatio-Temporal Artificial Neural Architecture.

The reference ships only a config for this model
(`/root/reference/src/dlwpbench/configs/model/distana.yaml`: type DISTANA,
hidden_size 16, layers 4, bias true) with NO implementation in the
checkout (SURVEY.md 2.4 #13); this implements the architecture from the
paper the config names (Karlbauer et al., "A Distributed Neural Network
Architecture for Robust Non-Linear Spatio-Temporal Prediction"):

- a lattice of weight-shared Prediction Kernels (PKs), one per grid cell;
- each PK receives its local dynamic input plus the LATERAL outputs its 8
  neighbors emitted on the previous step;
- PK = FC pre-layer (tanh) -> LSTM core(s) -> FC output layer producing
  the dynamic prediction and the next lateral output (tanh);
- closed-loop rollout with teacher forcing for the first `context_size`
  steps and residual dynamic prediction (the reference models' shared
  rollout contract).

TPU design: the PK lattice is expressed as per-cell Dense layers (1x1
convs on the MXU); the 8-neighbor lateral exchange is a static gather —
jnp.roll in longitude (periodic) and zero-shift in latitude on the
equirectangular mesh, the precomputed neighbor pad on HEALPix faces — so
one rollout step is pure matmul + gather and the whole rollout is one
`lax.scan`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dlwpbench_tpu.models.base import (
    _to_channels_first,
    _to_channels_last,
    wrap_remat,
)
from dlwpbench_tpu.ops.padding import healpix_pad_channels_last


def _neighbors_equirect(lat_field: jax.Array) -> jax.Array:
    """[B, H, W, L] lateral field -> [B, H, W, 8L] neighbor values
    (periodic in longitude, zero beyond the poles)."""
    B, H, W, L = lat_field.shape
    padded = jnp.pad(lat_field, ((0, 0), (1, 1), (0, 0), (0, 0)))
    outs = []
    for dy in (-1, 0, 1):
        row = padded[:, 1 + dy : 1 + dy + H]
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            outs.append(jnp.roll(row, shift=-dx, axis=2))
    return jnp.concatenate(outs, axis=-1)


def _neighbors_healpix(lat_field: jax.Array) -> jax.Array:
    """[B, F, H, W, L] -> [B, F, H, W, 8L] via the neighbor pad."""
    B, F, H, W, L = lat_field.shape
    padded = healpix_pad_channels_last(lat_field, 1)  # [B, F, H+2, W+2, L]
    outs = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            outs.append(padded[:, :, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W])
    return jnp.concatenate(outs, axis=-1)


class PredictionKernel(nn.Module):
    """One weight-shared PK applied to every grid cell (channel-wise Dense =
    1x1 conv over the lattice)."""

    hidden_size: int = 16
    layers: int = 4
    lateral_channels: int = 1
    out_channels: int = 1
    bias: bool = True

    @nn.compact
    def __call__(self, x, lat_in, states):
        """x: [..., Cin]; lat_in: [..., 8L]; states: list of (h, c)."""
        z = jnp.tanh(
            nn.Dense(self.hidden_size, use_bias=self.bias)(
                jnp.concatenate([x, lat_in], axis=-1)
            )
        )
        new_states = []
        for li in range(self.layers):
            h_prev, c_prev = states[li]
            gates = nn.Dense(4 * self.hidden_size, use_bias=self.bias)(
                jnp.concatenate([z, h_prev], axis=-1)
            )
            netin, i_g, f_g, o_g = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f_g) * c_prev + jax.nn.sigmoid(i_g) * jnp.tanh(netin)
            h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
            new_states.append((h, c))
            z = h
        out = nn.Dense(
            self.out_channels + self.lateral_channels, use_bias=self.bias
        )(z)
        dyn = out[..., : self.out_channels]
        lateral = jnp.tanh(out[..., self.out_channels :])
        return dyn, lateral, new_states


class DISTANA(nn.Module):
    """Reference config `type: DISTANA` (config-only upstream)."""

    name: str = "distana"
    constant_channels: int = 4
    prescribed_channels: int = 0
    prognostic_channels: int = 1
    hidden_size: int = 16
    layers: int = 4
    lateral_channels: int = 1
    bias: bool = True
    context_size: int = 1
    mesh: str = "equirectangular"
    # Per-step rematerialization (see RolloutModel / wrap_remat).
    remat: bool = False
    remat_policy: str = "full"

    def setup(self):
        self.pk = PredictionKernel(
            hidden_size=self.hidden_size,
            layers=self.layers,
            lateral_channels=self.lateral_channels,
            out_channels=self.prognostic_channels,
            bias=self.bias,
        )

    def _gather(self, lat_field):
        if self.mesh == "healpix":
            return _neighbors_healpix(lat_field)
        return _neighbors_equirect(lat_field)

    def __call__(self, constants=None, prescribed=None, prognostic=None):
        ctx = self.context_size
        T = prognostic.shape[1]
        prog = _to_channels_last(prognostic)  # [B, T, (F), H, W, C]
        const = _to_channels_last(constants)[:, 0] if constants is not None else None
        pres = _to_channels_last(prescribed) if prescribed is not None else None

        B = prog.shape[0]
        spatial = prog.shape[2:-1]
        states0 = [
            (
                jnp.zeros((B, *spatial, self.hidden_size), prog.dtype),
                jnp.zeros((B, *spatial, self.hidden_size), prog.dtype),
            )
            for _ in range(self.layers)
        ]
        lat0 = jnp.zeros((B, *spatial, self.lateral_channels), prog.dtype)

        xs = {"gt": jnp.moveaxis(prog, 1, 0), "t": jnp.arange(T)}
        if pres is not None:
            xs["pres"] = jnp.moveaxis(pres, 1, 0)

        def body(module, carry, xs_t):
            prev_out, lateral, states = carry
            in_t = jnp.where(xs_t["t"] < ctx, xs_t["gt"], prev_out)
            parts = []
            if const is not None:
                parts.append(const)
            if "pres" in xs_t:
                parts.append(xs_t["pres"])
            parts.append(in_t)
            x_t = jnp.concatenate(parts, axis=-1)
            lat_in = module._gather(lateral)
            delta, lateral, states = module.pk(x_t, lat_in, states)
            out = in_t + delta
            return (out, lateral, states), out

        scan = nn.scan(
            wrap_remat(body, self.remat, self.remat_policy),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        zeros_out = jnp.zeros_like(prog[:, 0])
        (_, _, _), outs = scan(self, (zeros_out, lat0, states0), xs)
        outs = jnp.moveaxis(outs, 0, 1)[:, ctx:]
        return _to_channels_first(outs)


class DISTANAHPX(DISTANA):
    """HEALPix-mesh DISTANA (lateral exchange via the face neighbor pad)."""

    mesh: str = "healpix"
