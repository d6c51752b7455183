"""Pangu-Weather — reference `models/panguweather/panguweather.py` (+utils).

3D (pressure-level, lat, lon) earth-specific transformer, 2D surface variant:
- PatchEmbed2D (zero pad to patch multiple, conv k=s=patch) -> tokens with a
  singleton pressure dim (`utils/patch_embed.py`);
- layer plan 2-6-6-2 (`panguweather.py:404-440`): layer1 (dim D) -> skip ->
  DownSample (2x2 token merge, Linear 4C->2C) -> layer2+layer3 (dim 2D) ->
  UpSample (Linear C->4C', pixel-shuffle, crop, LayerNorm, Linear) ->
  layer4 (dim D) -> concat skip -> PatchRecovery2D (ConvTranspose + crop);
- EarthSpecificBlock: pad3d to window multiples, optional cyclic shift with
  the longitude-merged mask (`utils/shift_window_mask.py`), EarthAttention3D,
  crop, double residual MLP (`panguweather.py:215-323`);
- EarthAttention3D (`panguweather.py:133-211`): windows batched as
  [B*nLon, nPl*nLat, N, C]; the position-bias table is *per window type*
  (pressure x latitude position, shared across longitude), indexed by
  `get_earth_position_index` (`utils/earth_position_index.py:4-45`).

Note: the reference's forward cyclic roll shifts longitude by `shift_lat`
(WeatherLearn quirk, `panguweather.py:292` `shifts=(-shift_pl, -shift_lat,
-shift_lat)`) while the reverse roll and the mask use `shift_lon`; we
implement the self-consistent (shift_pl, shift_lat, shift_lon) everywhere.

All masks/indices are numpy at trace time; attention is batched MXU einsums.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dlwpbench_tpu.models.base import RolloutModel
from dlwpbench_tpu.models.fourcastnet import Mlp, trunc_normal_init


# ---------------------------------------------------------------------------
# Static index/mask helpers (numpy)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def earth_position_index(window_size: tuple[int, int, int]) -> np.ndarray:
    wpl, wlat, wlon = window_size
    zi = np.arange(wpl)
    zj = -np.arange(wpl) * wpl
    hi = np.arange(wlat)
    hj = -np.arange(wlat) * wlat
    w = np.arange(wlon)
    c1 = np.stack(np.meshgrid(zi, hi, w, indexing="ij")).reshape(3, -1)
    c2 = np.stack(np.meshgrid(zj, hj, w, indexing="ij")).reshape(3, -1)
    coords = (c1[:, :, None] - c2[:, None, :]).transpose(1, 2, 0)
    coords[:, :, 2] += wlon - 1
    coords[:, :, 1] *= 2 * wlon - 1
    coords[:, :, 0] *= (2 * wlon - 1) * wlat * wlat
    return coords.sum(-1)  # [N, N]


def _pad3d_amounts(res, win):
    """(front, back, top, bottom, left, right) zero padding per dim."""
    out = []
    for r, w in zip(res, win):
        rem = r % w
        p = (w - rem) % w
        out.append((p // 2, p - p // 2))
    return out  # [(pl_f, pl_b), (lat_t, lat_b), (lon_l, lon_r)]


def window_partition_3d(x: jax.Array, win) -> jax.Array:
    """[B, Pl, Lat, Lon, C] -> [B*nLon, nPl*nLat, wpl*wlat*wlon, C]"""
    B, Pl, Lat, Lon, C = x.shape
    wpl, wlat, wlon = win
    x = x.reshape(B, Pl // wpl, wpl, Lat // wlat, wlat, Lon // wlon, wlon, C)
    x = x.transpose(0, 5, 1, 3, 2, 4, 6, 7)
    return x.reshape(
        B * (Lon // wlon), (Pl // wpl) * (Lat // wlat), wpl * wlat * wlon, C
    )


def window_reverse_3d(win_x: jax.Array, win, Pl, Lat, Lon) -> jax.Array:
    wpl, wlat, wlon = win
    C = win_x.shape[-1]
    B = win_x.shape[0] // (Lon // wlon)
    x = win_x.reshape(
        B, Lon // wlon, Pl // wpl, Lat // wlat, wpl, wlat, wlon, C
    )
    x = x.transpose(0, 2, 4, 3, 5, 1, 6, 7)
    return x.reshape(B, Pl, Lat, Lon, C)


@functools.lru_cache(maxsize=None)
def shift_window_groups_3d(pad_resolution, window_size, shift_size) -> np.ndarray:
    """Region group ids per window token, [nLon, nW, N]; longitude halves
    merged (reference `utils/shift_window_mask.py:40-73`).

    Only this SMALL array becomes a baked program constant; the dense
    [nLon, nW, N, N] mask is built on device (see `shift_window_mask`)."""
    Pl, Lat, Lon = pad_resolution
    wpl, wlat, wlon = window_size
    spl, slat, slon = shift_size
    img = np.zeros((1, Pl, Lat, Lon + slon, 1))
    cnt = 0
    for pl in (slice(0, -wpl), slice(-wpl, -spl), slice(-spl, None)):
        for lat in (slice(0, -wlat), slice(-wlat, -slat), slice(-slat, None)):
            for lon in (slice(0, -wlon), slice(-wlon, -slon), slice(-slon, None)):
                img[:, pl, lat, lon, :] = cnt
                cnt += 1
    img = img[:, :, :, :Lon, :]
    # numpy window partition
    x = img.reshape(1, Pl // wpl, wpl, Lat // wlat, wlat, Lon // wlon, wlon, 1)
    return x.transpose(0, 5, 1, 3, 2, 4, 6, 7).reshape(
        Lon // wlon, (Pl // wpl) * (Lat // wlat), wpl * wlat * wlon
    ).astype(np.float32)


def shift_window_mask(pad_resolution, window_size, shift_size) -> np.ndarray:
    """[nLon, nPl*nLat, N, N] of {0, -100} (numpy oracle; models build the
    same mask on device from `shift_window_groups_3d`)."""
    x = shift_window_groups_3d(pad_resolution, window_size, shift_size)
    diff = x[:, :, None, :] - x[:, :, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class EarthAttention3D(nn.Module):
    """Earth-specific window attention consuming a PRECOMPUTED bias.

    `bias` is [tow, nh, Nk, Nq] (the `window_attention_qkv` kernel layout;
    key-major) — the earth-position bias table expanded by
    `PanguWeather.precompute` ONCE per rollout (the reference gathers it
    per call, `panguweather.py:158-166`; under the `lax.scan` rollout that
    would redo the [N*N]-row gather for all 16 blocks every step).
    """

    dim: int
    pad_resolution: tuple[int, int, int]
    window_size: tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    # None = auto: packed kernel for small windows on TPU, flash for huge
    # windows, einsum otherwise.  True/False force flash/einsum; "packed"
    # forces the packed small-window kernel.
    use_flash: Optional[Any] = None
    # jax Mesh: sequence-shard window tokens over `dist_axis` and run ring
    # (context-parallel) attention on the flash-sized windows.
    spmd_mesh: Any = None
    dist_axis: str = "x"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: jax.Array,
        mask: Optional[jax.Array] = None,
    ):
        nh = self.num_heads

        if x.ndim == 5:
            # 5D path (PanguBlock skipped window_partition_3d): the qkv
            # Dense runs on the raw padded/rolled token field and the 5D
            # kernel reads each window as a contiguous HBM block — the
            # partition/reverse transposes never exist
            # (ops/pallas_attention.py::window_attention_qkv5d).  Param
            # names/shapes are identical to the partitioned paths (Dense
            # acts on the feature dim only), so checkpoints interchange.
            from dlwpbench_tpu.ops.pallas_attention import (
                window_attention_qkv5d,
            )

            C = x.shape[-1]
            qkv = nn.Dense(
                3 * C, use_bias=self.qkv_bias,
                kernel_init=trunc_normal_init(),
            )(x)
            out = window_attention_qkv5d(
                qkv, bias, mask, nh, tuple(self.window_size)
            )
            return nn.Dense(C, kernel_init=trunc_normal_init())(out)

        B_, nW, N, C = x.shape
        hd = C // nh
        scale = hd**-0.5

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, kernel_init=trunc_normal_init())(x)

        on_tpu = jax.default_backend() in ("tpu", "axon")
        # Auto rule: the packed kernel wins once there are enough windows to
        # amortize its per-program overhead (measured: 1.4-1.7x faster
        # training at batch >= 8, but ~1.3x slower batch-1 inference than
        # the einsum path, results/attention_training_notes.md).
        packed = self.use_flash == "packed" or (
            self.use_flash is None and on_tpu and N < 1024 and hd % 8 == 0
            and B_ * nW >= 64
        )
        if packed:
            # Token-major Pallas path: the kernel consumes the qkv Dense
            # output layout directly (a free reshape — no transposes on the
            # operands, outputs, or gradients) and covers all heads of
            # several batch members per program
            # (ops/pallas_attention.py::window_attention_qkv).
            from dlwpbench_tpu.ops.pallas_attention import window_attention_qkv

            L = 1 if mask is None else mask.shape[0]
            q5 = qkv.reshape(B_ // L, L, nW, N, 3 * C)
            out = window_attention_qkv(q5, bias, mask, nh)
            out = out.reshape(B_, nW, N, C)
            return nn.Dense(C, kernel_init=trunc_normal_init())(out)

        qkv = qkv.reshape(B_, nW, N, 3, nh, hd).transpose(3, 0, 4, 1, 2, 5)

        flash = self.use_flash is True or (
            self.use_flash is None and N >= 1024
        )
        if flash and hd % 8 == 0:
            # the wrapper handles any N (pads non-128-multiples internally)
            # Pallas fused path. Batch layout b = ((sample*nLon)+lon)*nW + w,
            # so a grouped bias [G, nh, N, N] with G = (nLon if masked else 1)
            # * nW is selected as group = b % G inside the kernel.
            from dlwpbench_tpu.ops.pallas_attention import flash_window_attention

            q, k, v = qkv[0], qkv[1], qkv[2]  # [B_, nh, nW, N, hd]
            q = q.transpose(0, 2, 1, 3, 4).reshape(B_ * nW, nh, N, hd)
            k = k.transpose(0, 2, 1, 3, 4).reshape(B_ * nW, nh, N, hd)
            v = v.transpose(0, 2, 1, 3, 4).reshape(B_ * nW, nh, N, hd)
            gb = bias.swapaxes(-1, -2)  # key-major -> [nW, nh, Nq, Nk]
            if mask is not None:
                nLon = mask.shape[0]
                gb = gb[None] + mask[:, :, None]  # [nLon, nW, nh, N, N]
                gb = gb.reshape(nLon * nW, nh, N, N)
            if self.spmd_mesh is not None and (
                N % self.spmd_mesh.shape[self.dist_axis] == 0
            ):
                from dlwpbench_tpu.parallel.ring_attention import (
                    ring_attention_sharded,
                )

                out = ring_attention_sharded(
                    q, k, v, gb, self.spmd_mesh, axis=self.dist_axis
                )
            else:
                out = flash_window_attention(q, k, v, gb)
            out = out.reshape(B_, nW, nh, N, hd).transpose(0, 2, 1, 3, 4)
        else:
            q, k, v = qkv[0] * scale, qkv[1], qkv[2]  # [B_, nh, nW, N, hd]
            attn = (
                jnp.einsum("bhwnd,bhwmd->bhwnm", q, k)
                + bias.transpose(1, 0, 3, 2)[None]
            )
            if mask is not None:
                nLon = mask.shape[0]
                attn = attn.reshape(B_ // nLon, nLon, nh, nW, N, N)
                attn = attn + mask[None, :, None]
                attn = attn.reshape(B_, nh, nW, N, N)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhwnm,bhwmd->bhwnd", attn, v)
        out = out.transpose(0, 2, 3, 1, 4).reshape(B_, nW, N, C)
        return nn.Dense(C, kernel_init=trunc_normal_init())(out)


def expand_earth_bias(
    table: jax.Array, window_size: tuple[int, int, int]
) -> jax.Array:
    """[(wpl^2*wlat^2*(2wlon-1)), tow, nh] table -> [tow, nh, Nk, Nq]
    (the `window_attention_qkv` kernel layout; fallback paths transpose)."""
    wpl, wlat, wlon = window_size
    N = wpl * wlat * wlon
    idx = jnp.asarray(earth_position_index(window_size))
    tow, nh = table.shape[1], table.shape[2]
    bias = table[idx.reshape(-1)].reshape(N, N, tow, nh)
    return bias.transpose(2, 3, 1, 0)


class EarthSpecificBlock(nn.Module):
    dim: int
    input_resolution: tuple[int, int, int]
    num_heads: int
    window_size: tuple[int, int, int] = (2, 6, 12)
    shift: bool = False
    mlp_ratio: float = 4.0
    # Reproduce the reference's forward-roll quirk (longitude rolled by
    # shift_lat instead of shift_lon, `panguweather.py:292`) for parity
    # testing; default False = self-consistent shifts.
    reference_roll_quirk: bool = False
    use_flash: Optional[Any] = None
    exact_gelu: bool = False
    spmd_mesh: Any = None
    dist_axis: str = "x"

    @nn.compact
    def __call__(self, x: jax.Array, bias: jax.Array):
        Pl, Lat, Lon = self.input_resolution
        B, L, C = x.shape
        win = self.window_size
        pads = _pad3d_amounts(self.input_resolution, win)
        pad_res = tuple(
            r + lo + hi for r, (lo, hi) in zip(self.input_resolution, pads)
        )
        shift_size = tuple(w // 2 for w in win)

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5)(x).reshape(B, Pl, Lat, Lon, C)
        x = jnp.pad(
            x, ((0, 0), pads[0], pads[1], pads[2], (0, 0))
        )

        if self.shift:
            spl, slat, slon = shift_size
            fwd_lon = slat if self.reference_roll_quirk else slon
            x = jnp.roll(x, (-spl, -slat, -fwd_lon), axis=(1, 2, 3))
            # Bake only the [nLon, nW, N] group ids; build the dense
            # [nLon, nW, N, N] mask on device, in the compute dtype (a f32
            # mask would silently promote the attention, and the scan
            # carry, to f32 under bf16).
            groups = jnp.asarray(
                shift_window_groups_3d(pad_res, win, shift_size)
            )
            mask = jnp.where(
                groups[:, :, None, :] != groups[:, :, :, None],
                jnp.asarray(-100.0, x.dtype),
                jnp.asarray(0.0, x.dtype),
            )
        else:
            mask = None

        # 5D fast path: when the packed kernel would be selected anyway,
        # keep the tokens in their padded 5D field and let the kernel's
        # BlockSpec index maps do the windowing — window_partition_3d /
        # window_reverse_3d (an 8-axis transpose pair per block inside the
        # rollout scan) never run.
        N = win[0] * win[1] * win[2]
        nW_all = (pad_res[0] // win[0]) * (pad_res[1] // win[1])
        B_win = B * (pad_res[2] // win[2])
        hd = C // self.num_heads
        on_tpu = jax.default_backend() in ("tpu", "axon")
        use5d = self.use_flash == "packed5d" or (
            self.use_flash in (None, "packed") and on_tpu and N < 1024
            and hd % 8 == 0 and B_win * nW_all >= 64
        )
        attn = EarthAttention3D(
            self.dim, pad_res, win, self.num_heads, use_flash=self.use_flash,
            spmd_mesh=self.spmd_mesh, dist_axis=self.dist_axis,
        )
        if use5d:
            x = attn(x, bias, mask)
        else:
            wins = window_partition_3d(x, win)
            wins = attn(wins, bias, mask)
            wins = wins.reshape(wins.shape[0], wins.shape[1], *win, C)
            x = window_reverse_3d(
                wins.reshape(wins.shape[0], wins.shape[1], -1, C),
                win, *pad_res,
            )

        if self.shift:
            x = jnp.roll(x, (spl, slat, slon), axis=(1, 2, 3))

        # crop the padding
        x = x[
            :,
            pads[0][0] : pads[0][0] + Pl,
            pads[1][0] : pads[1][0] + Lat,
            pads[2][0] : pads[2][0] + Lon,
        ]
        x = x.reshape(B, L, C)
        x = shortcut + x
        x = x + Mlp(int(C * self.mlp_ratio), C, approximate=not self.exact_gelu)(
            nn.LayerNorm(epsilon=1e-5)(x)
        )
        return x


class DownSample(nn.Module):
    """2x2 lat/lon token merge: pad -> gather -> LayerNorm -> Linear 4C->2C."""

    in_res: tuple[int, int, int]

    @nn.compact
    def __call__(self, x: jax.Array):
        B, L, C = x.shape
        Pl, Lat, Lon = self.in_res
        out_lat, out_lon = (Lat + 1) // 2, (Lon + 1) // 2
        x = x.reshape(B, Pl, Lat, Lon, C)
        x = jnp.pad(
            x,
            (
                (0, 0),
                (0, 0),
                (0, out_lat * 2 - Lat),
                (0, out_lon * 2 - Lon),
                (0, 0),
            ),
        )
        x = x.reshape(B, Pl, out_lat, 2, out_lon, 2, C).transpose(0, 1, 2, 4, 3, 5, 6)
        x = x.reshape(B, Pl * out_lat * out_lon, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        return nn.Dense(2 * C, use_bias=False, kernel_init=trunc_normal_init())(x)


class UpSample(nn.Module):
    """Linear C->4C', pixel shuffle 2x, crop to target, LayerNorm, Linear."""

    out_dim: int
    in_res: tuple[int, int, int]
    out_res: tuple[int, int, int]

    @nn.compact
    def __call__(self, x: jax.Array):
        B, N, C = x.shape
        Pl, in_lat, in_lon = self.in_res
        _, out_lat, out_lon = self.out_res
        x = nn.Dense(self.out_dim * 4, use_bias=False, kernel_init=trunc_normal_init())(x)
        x = x.reshape(B, Pl, in_lat, in_lon, 2, 2, self.out_dim)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            B, Pl, in_lat * 2, in_lon * 2, self.out_dim
        )
        pad_h = in_lat * 2 - out_lat
        pad_w = in_lon * 2 - out_lon
        t, l = pad_h // 2, pad_w // 2
        x = x[:, :, t : t + out_lat, l : l + out_lon]
        x = x.reshape(B, Pl * out_lat * out_lon, self.out_dim)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        return nn.Dense(self.out_dim, use_bias=False, kernel_init=trunc_normal_init())(x)


class PanguWeather(RolloutModel):
    """Reference `PanguWeather` (config `type: PanguWeather`).

    The per-block earth-position bias tables are declared in `setup()` so
    `precompute()` can expand them ([N*N]-row gather + transpose) ONCE per
    rollout instead of inside every scan step (see `RolloutModel.precompute`).
    """

    name: str = "pangu"
    constant_channels: int = 4
    prescribed_channels: int = 0
    prognostic_channels: int = 1
    embed_dim: int = 192
    num_heads: Sequence[int] = (6, 12, 12, 6)
    window_size: Sequence[int] = (2, 6, 12)
    patch_size: Sequence[int] = (4, 4)
    n_lat: int = 32
    n_lon: int = 64
    context_size: int = 1
    mesh: str = "equirectangular"
    reference_roll_quirk: bool = False
    # None = auto (packed kernel on TPU at small windows); True/False
    # force flash/einsum; "packed" forces the packed kernel.
    use_flash_attention: Optional[Any] = None
    # False = fast tanh-approx GELU; True = torch-exact erf GELU (parity)
    exact_gelu: bool = False
    # jax Mesh: ring/context-parallel attention on flash-sized windows
    spmd_mesh: Any = None
    dist_axis: str = "x"

    def _block_plan(self):
        """Static per-block geometry for the 2-6-6-2 layer plan."""
        ph, pw = self.patch_size
        Lat = -(-self.n_lat // ph)
        Lon = -(-self.n_lon // pw)
        res1 = (1, Lat, Lon)
        res2 = (1, (Lat + 1) // 2, (Lon + 1) // 2)
        win = tuple(self.window_size)
        plan = []
        for res, depth, heads in (
            (res1, 2, self.num_heads[0]),
            (res2, 6, self.num_heads[1]),
            (res2, 6, self.num_heads[2]),
            (res1, 2, self.num_heads[3]),
        ):
            pads = _pad3d_amounts(res, win)
            pad_res = tuple(r + lo + hi for r, (lo, hi) in zip(res, pads))
            tow = (pad_res[0] // win[0]) * (pad_res[1] // win[1])
            for i in range(depth):
                plan.append(
                    dict(res=res, pad_res=pad_res, tow=tow, heads=heads,
                         shift=(i % 2 == 1))
                )
        return plan

    def setup(self):
        win = tuple(self.window_size)
        wpl, wlat, wlon = win
        tables = []
        for b, blk in enumerate(self._block_plan()):
            tables.append(
                self.param(
                    f"earth_position_bias_table_{b}",
                    trunc_normal_init(),
                    ((wpl**2) * (wlat**2) * (2 * wlon - 1), blk["tow"],
                     blk["heads"]),
                )
            )
        self.bias_tables = tables

    def precompute(self):
        win = tuple(self.window_size)
        return [
            expand_earth_bias(t, win) for t in self.bias_tables
        ]

    @nn.compact
    def step(self, x: jax.Array, state: Any, aux=None) -> tuple[jax.Array, Any]:
        if aux is None:
            aux = self.precompute()
        B, H, W, Cin = x.shape
        ph, pw = self.patch_size
        D = self.embed_dim
        win = tuple(self.window_size)

        # PatchEmbed2D: symmetric zero pad to patch multiple, conv k=s=p
        pad_h = (ph - H % ph) % ph
        pad_w = (pw - W % pw) % pw
        x = jnp.pad(
            x,
            (
                (0, 0),
                (pad_h // 2, pad_h - pad_h // 2),
                (pad_w // 2, pad_w - pad_w // 2),
                (0, 0),
            ),
        )
        x = nn.Conv(D, (ph, pw), strides=(ph, pw), padding="VALID")(x)
        Lat, Lon = x.shape[1], x.shape[2]
        res1 = (1, Lat, Lon)  # singleton pressure level (2D surface variant)
        res2 = (1, (Lat + 1) // 2, (Lon + 1) // 2)
        x = x.reshape(B, Lat * Lon, D)

        block_idx = [0]

        def layer(x, dim, res, depth, heads):
            for i in range(depth):
                x = EarthSpecificBlock(
                    dim, res, heads, win, shift=(i % 2 == 1),
                    reference_roll_quirk=self.reference_roll_quirk,
                    use_flash=self.use_flash_attention,
                    exact_gelu=self.exact_gelu,
                    spmd_mesh=self.spmd_mesh, dist_axis=self.dist_axis,
                )(x, aux[block_idx[0]])
                block_idx[0] += 1
            return x

        x = layer(x, D, res1, 2, self.num_heads[0])
        skip = x
        x = DownSample(res1)(x)
        x = layer(x, 2 * D, res2, 6, self.num_heads[1])
        x = layer(x, 2 * D, res2, 6, self.num_heads[2])
        x = UpSample(D, res2, res1)(x)
        x = layer(x, D, res1, 2, self.num_heads[3])

        out = jnp.concatenate([x, skip], axis=-1)  # [B, Lat*Lon, 2D]
        out = out.reshape(B, Lat, Lon, 2 * D)
        # PatchRecovery2D: ConvTranspose k=s=patch then center crop
        out = nn.ConvTranspose(
            self.prognostic_channels, (ph, pw), strides=(ph, pw), padding="VALID"
        )(out)
        Ho, Wo = out.shape[1], out.shape[2]
        t, l = (Ho - H) // 2, (Wo - W) // 2
        return out[:, t : t + H, l : l + W], state
