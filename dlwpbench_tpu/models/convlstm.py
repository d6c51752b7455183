"""ConvLSTM / ConvLSTMHPX — reference `models/convlstm/convlstm.py`.

Architecture (reference facts):
- encoder: 3x (geo-padded 3x3 conv), tanh after the first two (`:148-165`);
- stack of ConvLSTM cells: one conv on cat(x, h) producing 4*hidden gate
  pre-activations, gate math tanh/sigmoid (`:46-64,92-111`);
- decoder: geo-padded 3x3 conv to prognostic channels (`:185-199`);
- rollout differs from the window models: it scans from t=0 over ALL steps
  with a single input frame per step — ground truth while t < context_size,
  else its own previous output — with persistent h/c state reset per batch,
  residual `out = in_t + net(...)`, returning outputs from context_size on
  (`:232-255`).

TPU design: the whole time loop is one `nn.scan` carrying (prev_out, h*, c*);
the gate conv is a single NHWC conv producing 4*hidden channels (one MXU op).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dlwpbench_tpu.models.base import (
    _to_channels_first,
    _to_channels_last,
    wrap_remat,
)
from dlwpbench_tpu.ops.conv import GeoConv, get_activation


class ConvLSTMCell(nn.Module):
    hidden_size: int
    mesh: str = "equirectangular"

    @nn.compact
    def __call__(self, x, h_prev, c_prev):
        conv_res = GeoConv(self.hidden_size * 4, 3, mesh=self.mesh)(
            jnp.concatenate([x, h_prev], axis=-1)
        )
        netin, igate, fgate, ogate = jnp.split(conv_res, 4, axis=-1)
        c = jax.nn.sigmoid(fgate) * c_prev + jax.nn.sigmoid(igate) * jnp.tanh(netin)
        h = jax.nn.sigmoid(ogate) * jnp.tanh(c)
        return h, c


class ConvLSTM(nn.Module):
    """Reference `ConvLSTM` (config `model/convlstm.yaml`)."""

    name: str = "convlstm"
    constant_channels: int = 4
    prescribed_channels: int = 0
    prognostic_channels: int = 1
    hidden_sizes: Sequence[int] = (16, 16)
    context_size: int = 1
    mesh: str = "equirectangular"
    activation: str = "tanh"
    # Per-step rematerialization (see RolloutModel): without it a T-step
    # rollout saves every gate/conv activation for backward — O(T * net).
    remat: bool = False
    remat_policy: str = "full"

    def setup(self):
        self.enc1 = GeoConv(self.hidden_sizes[0], 3, mesh=self.mesh)
        self.enc2 = GeoConv(self.hidden_sizes[0], 3, mesh=self.mesh)
        self.enc3 = GeoConv(self.hidden_sizes[0], 3, mesh=self.mesh)
        self.cells = [
            ConvLSTMCell(h, mesh=self.mesh) for h in self.hidden_sizes
        ]
        self.dec = GeoConv(self.prognostic_channels, 3, mesh=self.mesh)

    def _step(self, x_t, states):
        act = get_activation(self.activation)
        x = self.enc3(act(self.enc2(act(self.enc1(x_t)))))
        new_states = []
        for cell, (h, c) in zip(self.cells, states):
            x, c2 = cell(x, h, c)
            new_states.append((x, c2))
        return self.dec(x), new_states

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
                jnp.zeros((B, *spatial, h), prog.dtype),
                jnp.zeros((B, *spatial, h), prog.dtype),
            )
            for h in self.hidden_sizes
        ]

        xs = {
            "gt": jnp.moveaxis(prog, 1, 0),  # [T, B, ..., C]
            "t": jnp.arange(T),
        }
        if pres is not None:
            xs["pres"] = jnp.moveaxis(pres, 1, 0)

        def body(module, carry, xs_t):
            prev_out, states = carry
            in_t = jnp.where(xs_t["t"] < ctx, xs_t["gt"], prev_out)
            parts = []
            if const is not None:
                parts.append(const)
            if "pres" in xs_t:
                parts.append(xs_t["pres"])
            parts.append(in_t)
            x_t = jnp.concatenate(parts, axis=-1)
            delta, states = module._step(x_t, states)
            out = in_t + delta
            return (out, states), out

        scan = nn.scan(
            wrap_remat(body, self.remat, self.remat_policy),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        zeros_out = jnp.zeros_like(prog[:, 0])
        _, outs = scan(self, (zeros_out, states0), xs)
        outs = jnp.moveaxis(outs[ctx:], 0, 1)  # [B, T-ctx, ..., C]
        return _to_channels_first(outs)


class ConvLSTMHPX(ConvLSTM):
    """HEALPix ConvLSTM (reference `ConvLSTMHPX`, `convlstm.py:262-305`)."""

    mesh: str = "healpix"
