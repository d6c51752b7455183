"""ModernUNet (PDE-Refiner-style wide-residual U-Net) and its diffusion
variant — reference `models/unet/unet.py:73-272,559-952` and
`models/diffusion_models/modern_unet/modern_unet.py`.

Reference facts reproduced:
- pre-norm wide ResidualBlock with zero-initialized second conv and 1x1
  shortcut projection (`unet.py:839-906,878`), geo-padded (cylinder/HEALPix);
- optional FourierResidualBlock: SpectralConv2d + 1x1 conv pairs
  (`unet.py:780-836`);
- encoder: 1x1 stem at the top level, strided 3x3 conv downsample below,
  one ResidualBlock per level with skips collected after each block
  (`unet.py:578-633`);
- MiddleBlock: ResidualBlock (+ optional attention) + ResidualBlock
  (`unet.py:909-952`);
- decoder: skip-concat ResidualBlock per level, ConvTranspose k4 s2 p1
  upsample between levels, GroupNorm(8) + activation + zero-init 1x1 head
  (`unet.py:636-757`).  (The fork's lat-lon decoder has NameError bugs,
  `SURVEY.md` 2.9; we implement the self-consistent upstream design.)
- diffusion (DiffModernUNet): sinusoidal fourier time embedding -> 2-layer
  MLP (`modern_unet.py:10-30,86-90`); input = context + noised target on
  channels (`:92,155`); AdaGN scale-shift conditioning in every residual
  block (`:589-678`); inference runs the full DDPM refinement loop from pure
  noise per rollout step (`:175-208`), trained with v-prediction
  (`train.py:226-258`).

At init the zero-initialized blocks make the whole network output zero, so
the residual rollout starts as persistence — tested.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dlwpbench_tpu.models.base import (
    RolloutModel,
    _flatten_window,
    _to_channels_last,
)
from dlwpbench_tpu.ops import ddpm as ddpm_ops
from dlwpbench_tpu.ops.conv import GeoConv, get_activation
from dlwpbench_tpu.ops.spectral import SpectralConv2d


def fourier_embedding(t: jax.Array, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding (reference `modern_unet.py:10-30`)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class ZeroConv(nn.Module):
    """1x1/3x3 conv with zero-initialized kernel and bias."""

    features: int
    kernel_size: int = 3
    mesh: str = "equirectangular"

    @nn.compact
    def __call__(self, x):
        # GeoConv with zero init: reuse GeoConv but override initializers via
        # a plain conv here for k=1; for k>1 wrap GeoConv-like padding.
        from dlwpbench_tpu.ops.conv import (
            fold_faces,
            healpix_pad_channels_last,
            unfold_faces,
        )
        from dlwpbench_tpu.ops.padding import cylinder_pad

        k = self.kernel_size
        pad = k // 2
        conv = nn.Conv(
            self.features,
            (k, k),
            padding="VALID",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )
        if self.mesh == "healpix":
            if pad > 0:
                x = healpix_pad_channels_last(x, pad)
            return unfold_faces(conv(fold_faces(x)))
        if pad > 0:
            x = jnp.moveaxis(cylinder_pad(jnp.moveaxis(x, -1, 1), pad), 1, -1)
        return conv(x)


class GroupNormCL(nn.Module):
    """GroupNorm over channels-last [..., C] (flax GroupNorm handles this)."""

    num_groups: int = 1

    @nn.compact
    def __call__(self, x):
        spatial = x.shape[1:-1]
        c = x.shape[-1]
        groups = self.num_groups
        while c % groups:  # clamp to a divisor (tiny test configs)
            groups -= 1
        flat = x.reshape(x.shape[0], -1, c)
        y = nn.GroupNorm(num_groups=groups, epsilon=1e-5)(flat)
        return y.reshape(x.shape[0], *spatial, c)


class ResidualBlock(nn.Module):
    """Wide residual block; optional AdaGN time conditioning."""

    out_channels: int
    activation: str = "gelu"
    norm: bool = False
    n_groups: int = 1
    mesh: str = "equirectangular"
    use_scale_shift_norm: bool = False

    @nn.compact
    def __call__(self, x, emb: Optional[jax.Array] = None):
        act = get_activation(self.activation)
        h = x
        if self.norm:
            h = GroupNormCL(self.n_groups)(h)
        h = act(h)
        h = GeoConv(self.out_channels, 3, mesh=self.mesh)(h)

        if emb is not None:
            # AdaGN (`modern_unet.py:589-678`): emb -> (scale, shift).
            # NB the reference applies cond_emb to the raw embedding with NO
            # activation (`modern_unet.py:655,662`) — unlike the labml DDPM
            # UNet it is based on; we match the reference.
            eo = nn.Dense(
                2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
            )(emb)
            # broadcast over spatial dims: [B, 1, (1,) 1, C...]
            extra = h.ndim - 2
            eo = eo.reshape(eo.shape[0], *([1] * extra), eo.shape[-1])

        h2 = h
        if self.norm:
            h2 = GroupNormCL(self.n_groups)(h2)
        if emb is not None and self.use_scale_shift_norm:
            scale, shift = jnp.split(eo, 2, axis=-1)
            h2 = h2 * (1 + scale) + shift
        elif emb is not None:
            h2 = h2 + eo
        h2 = act(h2)
        h2 = ZeroConv(self.out_channels, 3, mesh=self.mesh)(h2)

        if x.shape[-1] != self.out_channels:
            x = GeoConv(self.out_channels, 1, mesh=self.mesh)(x)
        return h2 + x


class FourierResidualBlock(nn.Module):
    """Spectral residual block (reference `unet.py:780-836`)."""

    out_channels: int
    modes1: int = 16
    modes2: int = 16
    activation: str = "gelu"
    norm: bool = False
    n_groups: int = 1

    @nn.compact
    def __call__(self, x, emb=None):
        act = get_activation(self.activation)
        h = GroupNormCL(self.n_groups)(x) if self.norm else x
        h = act(h)
        y = SpectralConv2d(self.out_channels, self.modes1, self.modes2)(h)
        y = y + nn.Dense(self.out_channels)(h)
        y = GroupNormCL(self.n_groups)(y) if self.norm else y
        y = act(y)
        out = SpectralConv2d(self.out_channels, self.modes1, self.modes2)(y)
        out = out + nn.Dense(self.out_channels)(y)
        if x.shape[-1] != self.out_channels:
            x = nn.Dense(self.out_channels)(x)
        return out + x


class AttentionBlock(nn.Module):
    """Spatial self-attention over the token grid (optional; the reference
    declares but stubs it — provided here as a working implementation)."""

    channels: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        spatial = x.shape[1:-1]
        C = x.shape[-1]
        h = x.reshape(B, -1, C)
        h = nn.LayerNorm()(h)
        h = nn.MultiHeadDotProductAttention(num_heads=self.num_heads)(h, h)
        return x + h.reshape(B, *spatial, C)


class ModernUNetCore(nn.Module):
    """Shared encoder/middle/decoder trunk (time-conditioned when emb given).

    `variant` selects the exact block wiring:

    - "upstream": our default — the coherent PDE-Refiner design (stem conv,
      geo-padded strided downsample, skip-concat at every decoder level).
    - "reference": the reference `MUNetHPX` exactly as it executes
      (`unet.py:559-757`): plain zero-padded 3x3 s2 downsample convs, NO
      decoder skip concatenation (the reference's skip branch is dead code on
      the HEALPix path — `isinstance(submodule, ResidualBlock)` is False for
      `HEALPixLayer`-wrapped blocks, `unet.py:746-752`), TWO residual blocks
      per decoder level with c_out2 = 2*next_hidden, encoder/decoder blocks
      always norm-free (only MiddleBlock receives `norm`), final
      GroupNorm(8, 2*hidden[0]).
    - "diffusion": the diffusion file's design
      (`models/diffusion_models/modern_unet/modern_unet.py:328-507`): no stem
      conv, plain zero-padded downsample, skip-concat at every decoder level
      EXCEPT the bottom, one residual block per level, ConvTranspose k4 s2 p1
      to next hidden, final GroupNorm(4, hidden[0]).
    """

    hidden_channels: Sequence[int]
    out_channels: int
    activation: str = "gelu"
    norm: bool = False
    attention: bool = False
    mesh: str = "equirectangular"
    use_scale_shift_norm: bool = False
    use_fourier: bool = False
    fourier_modes: int = 16
    variant: str = "upstream"

    def _plain_conv(self, x, feat, k, s):
        """torch-style zero-padded conv (p=(k-1)//2) on folded faces."""
        from dlwpbench_tpu.ops.conv import fold_faces, unfold_faces

        p = (k - 1) // 2
        conv = nn.Conv(feat, (k, k), strides=(s, s), padding=((p, p), (p, p)))
        if self.mesh == "healpix":
            return unfold_faces(conv(fold_faces(x)))
        return conv(x)

    def _up4(self, x, feat):
        """torch ConvTranspose2d(k4, s2, p1): VALID transpose then crop 1."""
        from dlwpbench_tpu.ops.conv import fold_faces, unfold_faces

        up = nn.ConvTranspose(feat, (4, 4), strides=(2, 2), padding="VALID")
        if self.mesh == "healpix":
            y = unfold_faces(up(fold_faces(x)))
        else:
            y = up(x)
        return y[..., 1:-1, 1:-1, :]

    @nn.compact
    def __call__(self, x, emb: Optional[jax.Array] = None):
        act = get_activation(self.activation)
        hc = list(self.hidden_channels)
        variant = self.variant
        blk_norm = self.norm if variant == "upstream" else False
        in_hw = x.shape[1:3]
        skips = []
        # encoder
        for lvl, ch in enumerate(hc):
            if lvl == 0:
                if variant != "diffusion":
                    x = GeoConv(x.shape[-1], 1, mesh=self.mesh)(x)
            elif variant == "upstream":
                x = GeoConv(x.shape[-1], 3, mesh=self.mesh, strides=2)(x)
            else:
                # reference downsample is a plain zero-padded conv
                # (`unet.py:583`, outside the HEALPixLayer wrapper)
                x = self._plain_conv(x, x.shape[-1], 3, 2)
            if self.use_fourier and self.mesh == "equirectangular" and lvl == 0:
                x = FourierResidualBlock(
                    ch, self.fourier_modes, self.fourier_modes,
                    activation=self.activation, norm=blk_norm,
                )(x, emb)
            else:
                x = ResidualBlock(
                    ch, self.activation, blk_norm, mesh=self.mesh,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                )(x, emb)
            skips.append(x)

        # middle: res (+attn) res
        mid_groups = 4 if variant == "diffusion" else 1
        x = ResidualBlock(
            hc[-1], self.activation, self.norm, mid_groups, mesh=self.mesh,
            use_scale_shift_norm=self.use_scale_shift_norm,
        )(x, emb)
        if self.attention:
            x = AttentionBlock(hc[-1])(x)
        x = ResidualBlock(
            hc[-1], self.activation, self.norm, mid_groups, mesh=self.mesh,
            use_scale_shift_norm=self.use_scale_shift_norm,
        )(x, emb)

        # decoder
        def match_skip(x, skip):
            # odd grids (2.0-degree 90x180): stride-2 downsample rounds up,
            # upsampling doubles — crop back to the skip's spatial shape
            if self.mesh != "healpix" and x.shape[1:3] != skip.shape[1:3]:
                x = x[:, : skip.shape[1], : skip.shape[2]]
            return x

        rev = hc[::-1]
        for i, ch in enumerate(rev):
            if variant == "upstream":
                skip = skips[len(hc) - 1 - i]
                x = jnp.concatenate([skip, match_skip(x, skip)], axis=-1)
            elif variant == "diffusion" and i > 0:
                skip = skips[len(hc) - 1 - i]
                x = jnp.concatenate([skip, match_skip(x, skip)], axis=-1)
            x = ResidualBlock(
                ch, self.activation, blk_norm, mesh=self.mesh,
                use_scale_shift_norm=self.use_scale_shift_norm,
            )(x, emb)
            if variant == "reference":
                c_out2 = 2 * (rev[i + 1] if i + 1 < len(rev) else rev[i])
                x = ResidualBlock(
                    c_out2, self.activation, blk_norm, mesh=self.mesh,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                )(x, emb)
                if i < len(rev) - 1:
                    x = self._up4(x, c_out2)
            elif i < len(rev) - 1:
                if variant == "diffusion":
                    x = self._up4(x, rev[i + 1])
                else:
                    # flax "SAME" ConvTranspose: same out = 2*in geometry
                    up = nn.ConvTranspose(
                        rev[i + 1], (4, 4), strides=(2, 2), padding="SAME"
                    )
                    if self.mesh == "healpix":
                        from dlwpbench_tpu.ops.conv import (
                            fold_faces,
                            unfold_faces,
                        )

                        x = unfold_faces(up(fold_faces(x)))
                    else:
                        x = up(x)

        if self.mesh != "healpix" and x.shape[1:3] != in_hw:
            x = x[:, : in_hw[0], : in_hw[1]]  # odd-grid final crop
        x = GroupNormCL(4 if variant == "diffusion" else 8)(x)
        x = act(x)
        return ZeroConv(self.out_channels, 1, mesh=self.mesh)(x)


class ModernUNet(RolloutModel):
    """Reference `ModernUNet` (config `type: ModernUNet`)."""

    name: str = "modern_unet"
    constant_channels: int = 4
    prescribed_channels: int = 0
    prognostic_channels: int = 1
    hidden_channels: Sequence[int] = (64, 128, 256, 1024)
    activation: str = "gelu"
    context_size: int = 1
    mesh: str = "equirectangular"
    attention: bool = False
    norm: bool = False
    use_fourier: bool = False
    # "upstream" (our default design) or "reference" (the as-executed
    # reference MUNetHPX wiring — see ModernUNetCore docstring)
    variant: str = "upstream"

    @nn.compact
    def step(self, x: jax.Array, state: Any) -> tuple[jax.Array, Any]:
        out = ModernUNetCore(
            hidden_channels=tuple(self.hidden_channels),
            out_channels=self.prognostic_channels,
            activation=self.activation,
            norm=self.norm,
            attention=self.attention,
            mesh=self.mesh,
            use_fourier=self.use_fourier,
            variant=self.variant,
        )(x)
        return out, state


class MUNetHPX(ModernUNet):
    """HEALPix ModernUNet (reference `MUNetHPX`)."""

    mesh: str = "healpix"


class DiffModernUNet(nn.Module):
    """PDE-Refiner diffusion model (reference `DiffModernUNet`).

    Training uses `single_forward` (denoise one refinement step, v-predict);
    inference (`__call__`) runs the rollout where each step performs the full
    DDPM refinement loop from pure noise.
    """

    name: str = "diff_modern_unet"
    constant_channels: int = 4
    prescribed_channels: int = 0
    prognostic_channels: int = 1
    hidden_channels: Sequence[int] = (64, 128, 256, 1024)
    activation: str = "gelu"
    context_size: int = 1
    mesh: str = "equirectangular"
    attention: bool = False
    norm: bool = False
    use_scale_shift_norm: bool = True
    num_refinement_step: int = 5
    min_noise_std: float = 4e-4
    # Train-time noise schedule length (training.num_refinement_steps,
    # reference `configs/training/diffusion.yaml:12` = 1000).  Inference
    # SUBSAMPLES num_refinement_step of these T+1 timesteps exactly like
    # diffusers' set_timesteps (reference `evaluate.py:197-202`) — both
    # the noise levels and the model's time conditioning must come from
    # the schedule the denoiser was trained on.
    train_noise_steps: int = 1000
    # "reference": ancestral DDPM sampling, exactly the reference's
    # deployed inference (`evaluate.py:194-202` + diffusers step).  NOTE:
    # the reference's 1001-step remix of the PDE-Refiner beta schedule
    # drives the mid-trajectory posterior variance to ~0.16 (vs the
    # paper's tiny sigma_k), so each refinement step RE-INJECTS noise
    # comparable to the signal: measured on the NS track, sampled
    # residual RMSE 0.41 vs 0.19 one-shot and 0.09 mean-only
    # (persistence 0.21).  "mean": deterministic posterior-mean
    # refinement (key=None steps) — the conditional-mean point estimate
    # appropriate for MSE metrics, and the schedule PDE-Refiner's tiny
    # noise levels approximate anyway.
    sampler: str = "reference"
    # "diffusion" matches the reference diffusion file exactly
    # (`modern_unet.py:328-507`); "upstream" uses our default core wiring.
    variant: str = "diffusion"

    def setup(self):
        d = self.hidden_channels[0]
        self.time_mlp1 = nn.Dense(4 * d)
        self.time_mlp2 = nn.Dense(4 * d)
        self.core = ModernUNetCore(
            hidden_channels=tuple(self.hidden_channels),
            out_channels=self.prognostic_channels,
            activation=self.activation,
            norm=self.norm,
            attention=self.attention,
            mesh=self.mesh,
            use_scale_shift_norm=self.use_scale_shift_norm,
            variant=self.variant,
        )

    def _time_embed(self, k: jax.Array) -> jax.Array:
        # k in refinement steps; scaled by 1000/K (`modern_unet.py:142-145`)
        act = get_activation(self.activation)
        t = k.astype(jnp.float32) * (1000.0 / self.num_refinement_step)
        emb = fourier_embedding(t, self.hidden_channels[0])
        return self.time_mlp2(act(self.time_mlp1(emb)))

    def single_forward(self, constants, prescribed, prognostic, y_noised, k):
        """Denoiser: channel-first inputs like the reference.

        constants [B,1,Cc,(F),H,W] | None, prescribed [B,ctx,Cp,...] | None,
        prognostic [B,ctx,Cq,...], y_noised [B,1,Cq,...], k [B] int.
        """
        ctx = prognostic.shape[1]
        y = jnp.broadcast_to(
            y_noised, (y_noised.shape[0], ctx, *y_noised.shape[2:])
        )
        prog_in = jnp.concatenate([prognostic, y], axis=2)
        parts = []
        if constants is not None:
            parts.append(_to_channels_last(constants)[:, 0])
        if prescribed is not None:
            parts.append(_flatten_window(_to_channels_last(prescribed)))
        parts.append(_flatten_window(_to_channels_last(prog_in)))
        x = jnp.concatenate(parts, axis=-1)
        emb = self._time_embed(k)
        out = self.core(x, emb)
        return jnp.moveaxis(out, -1, 1)  # [B, Cq, (F), H, W]

    def __call__(self, constants=None, prescribed=None, prognostic=None, rng=None):
        """Full rollout with the DDPM refinement loop per step."""
        ctx = self.context_size
        T = prognostic.shape[1]
        steps = T - ctx
        # the TRAIN schedule, subsampled to num_refinement_step inference
        # timesteps (reference `evaluate.py:197-202` + diffusers
        # set_timesteps; e.g. [800, 600, 400, 200, 0] for 1000/5)
        sched = ddpm_ops.make_refiner_schedule(
            self.train_noise_steps, self.min_noise_std
        )
        ts = ddpm_ops.subsampled_timesteps(
            sched.num_timesteps, self.num_refinement_step
        )
        step_ratio = sched.num_timesteps // self.num_refinement_step
        if rng is None:
            rng = self.make_rng("diffusion") if self.has_rng("diffusion") else jax.random.PRNGKey(0)

        prog = prognostic
        pres = prescribed

        def rollout_body(module, carry, i):
            window, key = carry  # window: [B, ctx, Cq, ...] channel-first
            key, knoise = jax.random.split(key)
            pres_t = (
                jax.lax.dynamic_slice_in_dim(pres, i, ctx, axis=1)
                if pres is not None
                else None
            )
            y = jax.random.normal(
                knoise, (window.shape[0], 1, *window.shape[2:]), window.dtype
            )

            if self.sampler not in ("reference", "mean"):
                raise ValueError(
                    f"sampler={self.sampler!r}: expected 'reference' "
                    "(ancestral DDPM, the deployed reference inference) or "
                    "'mean' (deterministic posterior-mean refinement)"
                )

            def refine(mod, y, k):
                pred = mod.single_forward(
                    constants, pres_t, window, y,
                    jnp.full((window.shape[0],), k),
                )
                sub = (
                    None if self.sampler == "mean"
                    else jax.random.fold_in(key, k)
                )
                y2 = ddpm_ops.step(
                    sched, pred[:, None], k, y, sub,
                    prev_t=k - step_ratio,
                )
                return y2, None

            ks = jnp.asarray(ts)
            inner = nn.scan(
                refine,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )
            y, _ = inner(module, y, ks)
            out = window[:, -1] + y[:, 0]
            window = jnp.concatenate([window[:, 1:], out[:, None]], axis=1)
            return (window, key), out

        scan = nn.scan(
            rollout_body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        (window, _), outs = scan(self, (prog[:, :ctx], rng), jnp.arange(steps))
        return jnp.moveaxis(outs, 0, 1)


class DiffMUNetHPX(DiffModernUNet):
    """HEALPix diffusion ModernUNet (reference `DiffMUNetHPX`)."""

    mesh: str = "healpix"


class ConvNeXtLSTMBlock(nn.Module):
    """ConvNeXt-style LSTM cell (reference `unet.py:958-1071`, the optional
    recurrent block of the ModernUNet decoder).

    Spatial mixing: depthwise k7 geo-conv on cat(x, h) -> GroupNorm ->
    1x1 conv to 4*C gates -> GroupNorm(4); LSTM gate activation
    (f, i, g, o); hidden = sigmoid(o) * GELU(GroupNorm(1x1(c_prev))).
    Stateless functional form: call with (x, h, c) -> (h', c').
    """

    channels: int
    kernel_size: int = 7
    mesh: str = "equirectangular"
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, h, c):
        act = get_activation(self.activation)
        C = self.channels
        z = jnp.concatenate([x, h], axis=-1)
        # depthwise spatial mixing: feature_group_count == in_channels
        k = self.kernel_size
        pad = k // 2
        from dlwpbench_tpu.ops.padding import cylinder_pad

        if self.mesh == "equirectangular":
            z = jnp.moveaxis(cylinder_pad(jnp.moveaxis(z, -1, 1), pad), 1, -1)
        else:
            from dlwpbench_tpu.ops.padding import healpix_pad_channels_last

            z = healpix_pad_channels_last(z, pad)
        conv_dw = nn.Conv(
            C, (k, k), padding="VALID", feature_group_count=C
        )
        if self.mesh == "healpix":
            from dlwpbench_tpu.ops.conv import fold_faces, unfold_faces

            z = unfold_faces(conv_dw(fold_faces(z)))
        else:
            z = conv_dw(z)
        z = GroupNormCL(1)(z)
        z = nn.Conv(4 * C, (1, 1))(z) if z.ndim == 4 else nn.Dense(4 * C)(z)
        z = GroupNormCL(4)(z)

        f, i, g, o = jnp.split(z, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        out_path = nn.Conv(C, (1, 1))(c) if c.ndim == 4 else nn.Dense(C)(c)
        out_path = act(GroupNormCL(1)(out_path))
        h_new = jax.nn.sigmoid(o) * out_path
        return h_new, c_new
