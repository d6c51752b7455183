"""Geometry-aware convolution building blocks (flax.linen, channels-last).

The reference wraps every conv in either `CylinderPad` (`utils/utils.py:11`)
or `HEALPixLayer` (`utils/healpix.py:69-114`, which auto-inserts
`HEALPixPadding` and disables native padding).  Here the same capability is a
single `GeoConv` module parameterized by `mesh`:

- mesh="equirectangular": cylinder pad (circular lon, zero lat) + VALID conv.
- mesh="healpix": neighbor-gather pad of the 12 faces + per-face VALID conv
  (faces folded into the batch dim for the conv, the TPU-friendly layout —
  one big NHWC conv on the MXU instead of 12 small ones).
- mesh="plain": ordinary SAME/VALID conv (used by the NS synthetic track).

All modules are channels-last ([B, H, W, C] or [B, F, H, W, C]) because XLA
TPU convolutions are fastest in NHWC with C on the 128-lane axis.
"""

from __future__ import annotations

import re
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from dlwpbench_tpu.ops.padding import cylinder_pad, healpix_pad_channels_last


def fold_faces(x: jax.Array) -> jax.Array:
    """[B, F, H, W, C] -> [B*F, H, W, C] (reference HEALPixFoldFaces)."""
    B, F, H, W, C = x.shape
    return x.reshape(B * F, H, W, C)


def unfold_faces(x: jax.Array, faces: int = 12) -> jax.Array:
    """[B*F, H, W, C] -> [B, F, H, W, C] (reference HEALPixUnfoldFaces)."""
    BF, H, W, C = x.shape
    return x.reshape(BF // faces, faces, H, W, C)


class GeoConv(nn.Module):
    """Boundary-aware 2D convolution.

    On "equirectangular"/"healpix" meshes, kernels > 1 are padded with the
    correct global boundary condition and convolved VALID; 1x1 convs skip
    padding entirely (reference `healpix.py:87-97` semantics).
    """

    features: int
    kernel_size: int = 3
    mesh: str = "equirectangular"
    strides: int = 1
    use_bias: bool = True
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        pad = (k // 2) * self.dilation
        conv = nn.Conv(
            self.features,
            (k, k),
            strides=(self.strides, self.strides),
            padding="VALID",
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
        )
        if self.mesh == "healpix":
            # x: [B, F, H, W, C] -> pad faces, fold into batch, one NHWC conv
            if pad > 0:
                x = healpix_pad_channels_last(x, pad)
            return unfold_faces(conv(fold_faces(x)))
        if self.mesh == "equirectangular":
            if pad > 0:
                # cylinder_pad pads the trailing [H, W]; move C out of the way
                x = jnp.moveaxis(cylinder_pad(jnp.moveaxis(x, -1, 1), pad), 1, -1)
            return conv(x)
        if self.mesh == "plain":
            if pad > 0:
                x = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
            return conv(x)
        if self.mesh == "torus":
            # fully periodic (the Navier-Stokes domain boundary condition)
            if pad > 0:
                x = jnp.concatenate([x[:, :, -pad:], x, x[:, :, :pad]], axis=2)
                x = jnp.concatenate([x[:, -pad:], x, x[:, :pad]], axis=1)
            return conv(x)
        raise ValueError(f"unknown mesh {self.mesh!r}")


class GeoConvTranspose(nn.Module):
    """2x upsampling transposed conv (reference UNet decoder `unet.py:532`)."""

    features: int
    kernel_size: int = 2
    stride: int = 2
    mesh: str = "equirectangular"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        up = nn.ConvTranspose(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="VALID",
        )
        if self.mesh == "healpix":
            return unfold_faces(up(fold_faces(x)))
        return up(x)


def avg_pool_2x(x: jax.Array, mesh: str = "equirectangular") -> jax.Array:
    """2x2/stride-2 average pool (reference UNet encoder `unet.py:450`)."""
    if mesh == "healpix":
        B, F, H, W, C = x.shape
        y = nn.avg_pool(x.reshape(B * F, H, W, C), (2, 2), (2, 2))
        return y.reshape(B, F, H // 2, W // 2, C)
    return nn.avg_pool(x, (2, 2), (2, 2))


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    # tanh-approximate gelu: ~2x rollout throughput on TPU vs the erf exact
    # form (the erf transcendental dominates the VPU after every conv);
    # activation-level difference ~1e-3.  Use "gelu_exact" for bitwise
    # torch parity (the parity tests do).
    "gelu": lambda x: nn.gelu(x, approximate=True),
    "gelu_exact": lambda x: nn.gelu(x, approximate=False),
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "silu": nn.silu,
    "sigmoid": nn.sigmoid,
    "identity": lambda x: x,
    # Modulus activation-factory extras (reference GraphCast lineage,
    # `models/graphcast/utils/activations.py:128-155`)
    "stan": lambda x: jnp.tanh(x) * (x + 1.0),
    "squareplus": lambda x: 0.5 * (x + jnp.sqrt(x * x + 4.0)),
    # the reference factory's slope is 0.1 (`activations.py:106`), not
    # torch's/flax's 0.01 default
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
    "elu": nn.elu,
    "gelu_erf": lambda x: nn.gelu(x, approximate=False),
    # torch-module equivalents reachable through config specs — exact
    # functions, so an unknown name can refuse loudly instead of a
    # substring match silently substituting different math
    "selu": jax.nn.selu,
    "relu6": jax.nn.relu6,
    "celu": jax.nn.celu,
    "softplus": jax.nn.softplus,
    "softsign": jax.nn.soft_sign,
    "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
    "hardswish": jax.nn.hard_swish,
    "hardsigmoid": jax.nn.hard_sigmoid,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}


# torch classes whose first argument parameterizes the function, with the
# torch default (NOT the Modulus-factory default — a torch spec eval()s to
# the torch module): class -> (fn(x, val), default)
_TORCH_PARAM_CLASSES: dict[str, tuple[Callable, float]] = {
    "leakyrelu": (lambda x, v: nn.leaky_relu(x, negative_slope=v), 0.01),
    "elu": (lambda x, v: nn.elu(x, alpha=v), 1.0),
    "celu": (lambda x, v: nn.celu(x, alpha=v), 1.0),
}


def get_activation(name) -> Callable[[jax.Array], jax.Array]:
    if callable(name):
        return name
    key = str(name).lower().strip()
    if key in ACTIVATIONS:  # exact name first ("gelu_exact" vs "gelu")
        return ACTIVATIONS[key]
    # Reference-style torch specs like "torch.nn.GELU()" are eval()ed as
    # torch modules by the reference (`unet.py` configs), so any DOTTED
    # module path gets exact torch semantics: erf GELU (not this
    # framework's tanh-approx fast default, which bare "gelu" keeps),
    # torch's LeakyReLU slope 0.01 (not the Modulus factory's 0.1, which
    # bare "leaky_relu" keeps), first numeric argument honored
    # ("inplace=True" and GELU's approximate= kwarg are parsed, other
    # kwargs refuse).  Matching is EXACT on the normalized class name —
    # an unknown name (Softshrink, ...) raises instead of silently
    # substituting a mathematically different function.
    call = re.fullmatch(r"([a-z_][\w.]*)\s*\((.*)\)", key)
    head = call.group(1) if call else key
    torchy = "." in head
    cls = head.rsplit(".", 1)[-1].replace("_", "").strip()
    val = None
    gelu_approx = False
    if call:
        for part in call.group(2).split(","):
            part = part.strip()
            if not part or part.startswith("inplace"):
                continue
            ap = re.fullmatch(r"approximate\s*=\s*['\"]?(none|tanh)['\"]?",
                              part)
            if ap and cls == "gelu":
                gelu_approx = ap.group(1) == "tanh"
                continue
            m = re.fullmatch(r"(?:\w+\s*=\s*)?([-+0-9.eE]+)", part)
            if m:
                val = float(m.group(1))
                break
            raise ValueError(f"unsupported activation argument {part!r} "
                             f"in {name!r}")
    if torchy or call:
        if cls in _TORCH_PARAM_CLASSES:
            fn, default = _TORCH_PARAM_CLASSES[cls]
            v = default if val is None else val
            return lambda x: fn(x, v)
        if val is not None:
            raise ValueError(
                f"activation {name!r} has a numeric argument but "
                f"{cls!r} is not a known parameterized activation")
    if torchy and cls == "gelu":
        return ACTIVATIONS["gelu" if gelu_approx else "gelu_exact"]
    by_norm = {k.replace("_", ""): v for k, v in ACTIVATIONS.items()}
    if cls in by_norm:
        return by_norm[cls]
    raise ValueError(f"unknown activation {name!r}")
