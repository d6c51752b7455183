"""Swin Transformer (+ HEALPix variant) — reference
`models/swintransformer/swin_transformer.py`.

Reference facts reproduced:
- WindowAttention with relative-position bias table indexed by precomputed
  pairwise offsets (`:74-154`), qk scale head_dim^-0.5, trunc-normal 0.02;
- SwinTransformerBlock: pre-norm attention with cyclic shift + additive
  -100 mask, circular-longitude / zero-latitude pad to window multiples
  (`:200-264`), MLP with second residual;
- BasicLayer: `depth` blocks alternating shift 0 / window//2, shift mask
  built from the 9-region img-mask trick (`:380-401`), PatchMerging
  (2x2 gather -> LayerNorm -> Linear 4C->2C, `:267-308`) between stages;
- **global-size windows**: window_size = current resolution per stage
  (`:561`), halving with each PatchMerging;
- PatchEmbed conv k=s=patch with circular-lon pad (`:416-460`), optional
  absolute pos embed (ape);
- U-Net-style ConvTranspose decoder over the per-stage normed features with
  skip concatenation, GELU, final 1x1 conv head (`:586-607,671-677`);
- rollout/residual semantics from `RolloutModel`;
- HPX variant: 12 faces arranged into a 3x4 rectangle and back
  (`:826-847,867-879`).

All masks/indices are computed in numpy at trace time (static shapes); the
attention itself is batched einsums on the MXU.
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


def window_partition(x: jax.Array, wh: int, ww: int) -> jax.Array:
    """[B, H, W, C] -> [B*nW, wh*ww, C]"""
    B, H, W, C = x.shape
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, C)


def window_reverse(win: jax.Array, wh: int, ww: int, H: int, W: int) -> jax.Array:
    """[B*nW, wh*ww, C] -> [B, H, W, C]"""
    C = win.shape[-1]
    B = win.shape[0] // (H * W // wh // ww)
    x = win.reshape(B, H // wh, W // ww, wh, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


@functools.lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Pairwise relative-position bias indices (reference `:100-113`)."""
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # [N, N]


@functools.lru_cache(maxsize=None)
def shift_window_groups(Hp: int, Wp: int, wh: int, ww: int, sh: int, sw: int) -> np.ndarray:
    """9-region group id per window token, [nW, N] (`:380-401`).

    Kept separate from the dense mask so only this SMALL array is baked
    into the compiled program as a constant; the [nW, N, N] mask itself is
    built on device (at N = 12288, a baked fp32 mask is ~600 MB of program
    payload — over the compile-relay request limit)."""
    img = np.zeros((Hp, Wp))
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh if sh else None), slice(-sh, None) if sh else slice(0, 0)):
        for ws in (slice(0, -ww), slice(-ww, -sw if sw else None), slice(-sw, None) if sw else slice(0, 0)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(Hp // wh, wh, Wp // ww, ww).transpose(0, 2, 1, 3)
    return win.reshape(-1, wh * ww).astype(np.float32)


def shift_attn_mask(Hp: int, Wp: int, wh: int, ww: int, sh: int, sw: int) -> np.ndarray:
    """Shifted-window attention mask [nW, N, N] of {0, -100} (`:380-401`)."""
    win = shift_window_groups(Hp, Wp, wh, ww, sh, sw)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Window attention consuming a PRECOMPUTED bias.

    `bias` is [nh, N, N] or [G, nh, N, N] (per-window, selected as
    b % G) with the relative-position bias and any shift mask already
    folded in — expanded once per rollout by `SwinTransformer.precompute`
    (reference recomputes it per call, `swin_transformer.py:115-126`; under
    a `lax.scan` rollout that would rebuild ~50 MB per block per step).
    """

    dim: int
    window: tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    # None = auto: flash for global-size windows, packed kernel for many
    # small windows on TPU, einsum otherwise; True/False force flash/einsum;
    # "packed" forces the packed small-window kernel.
    use_flash: Optional[Any] = None
    # window count of the caller's [B*nW, N, C] batch layout — needed by
    # the token-major packed kernel when the bias is shared (unshifted
    # blocks), where nW cannot be inferred from the bias.
    n_windows: Optional[int] = None
    # jax Mesh: sequence-shard the window tokens over `dist_axis` and run
    # ring (context-parallel) attention (parallel/ring_attention.py).
    spmd_mesh: Any = None
    dist_axis: str = "x"

    @nn.compact
    def __call__(self, x: jax.Array, bias: jax.Array):
        # x: [B_, N, C]
        B_, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        scale = self.qk_scale or hd**-0.5

        qkv_raw = nn.Dense(
            3 * C, use_bias=self.qkv_bias, kernel_init=trunc_normal_init()
        )(x)

        on_tpu = jax.default_backend() in ("tpu", "axon")
        packed = self.use_flash == "packed" or (
            self.use_flash is None and on_tpu and N < 1024 and hd % 8 == 0
            and B_ >= 64
        )
        if not packed:
            qkv = qkv_raw.reshape(B_, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # [B_, nh, N, hd]
        if packed:
            # Token-major packed path (`window_attention_qkv`, the Pangu
            # round-4 kernel): consumes the qkv Dense output layout
            # directly with G-member programs.  Round 5 replaces the
            # per-(window, head) transposed-layout kernel here — that
            # kernel reproducibly faults the TPU worker inside the
            # two-stage swin_win8 graph at 180x360 (standalone it passes
            # at the same geometry; see results/swin_win8_crash.md), and
            # the token-major kernel is also the faster design.
            # B_ = sample*nW + window; bias arrives QUERY-major
            # ([*, nh, Nq, Nk]) and the kernel wants KEY-major.
            from dlwpbench_tpu.ops.pallas_attention import (
                window_attention_qkv,
            )

            gb = bias if bias.ndim == 4 else bias[None]
            nW = gb.shape[0] if gb.shape[0] > 1 else None
            if nW is None:
                # unshifted: one shared bias; window count comes from the
                # caller's batch layout via n_windows
                nW = self.n_windows or 1
            q5 = qkv_raw.reshape(B_ // nW, 1, nW, N, 3 * C)
            out = window_attention_qkv(
                q5, gb.swapaxes(-1, -2), None, nh
            )
            out = out.reshape(B_, N, C)
            return nn.Dense(C, kernel_init=trunc_normal_init())(out)

        if self.spmd_mesh is not None and hd % 8 == 0 and (
            N % self.spmd_mesh.shape[self.dist_axis] == 0
        ):
            # context-parallel: tokens sequence-sharded over the mesh axis,
            # kv chunks rotating via ppermute, lse-merged partial softmax
            from dlwpbench_tpu.parallel.ring_attention import (
                ring_attention_sharded,
            )

            out = ring_attention_sharded(
                q, k, v, bias, self.spmd_mesh, axis=self.dist_axis
            )
            out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
            return nn.Dense(C, kernel_init=trunc_normal_init())(out)

        flash = self.use_flash is True or (
            self.use_flash is None and N >= 1024
        )
        if flash and hd % 8 == 0:
            # the kernels stream cdiv blocks; any N works (tails iota-masked)
            from dlwpbench_tpu.ops.pallas_attention import flash_window_attention

            out = flash_window_attention(q, k, v, bias)
        else:
            if bias.ndim == 3:
                attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k) + bias[None]
            else:
                G = bias.shape[0]
                attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
                attn = attn.reshape(B_ // G, G, nh, N, N) + bias[None]
                attn = attn.reshape(B_, nh, N, N)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, kernel_init=trunc_normal_init())(out)


def expand_relative_bias(table: jax.Array, wh: int, ww: int) -> jax.Array:
    """[(2wh-1)*(2ww-1), nh] bias table -> [nh, N, N] via two structured
    gathers (a small x-offset gather then a y-offset gather with large
    contiguous rows) instead of one [N*N]-row random gather."""
    nh = table.shape[-1]
    N = wh * ww
    T = table.reshape(2 * wh - 1, 2 * ww - 1, nh)
    dx = jnp.asarray((np.arange(ww)[:, None] - np.arange(ww)[None, :]) + ww - 1)
    T2 = jnp.take(T, dx.reshape(-1), axis=1).reshape(2 * wh - 1, ww, ww, nh)
    dy = jnp.asarray((np.arange(wh)[:, None] - np.arange(wh)[None, :]) + wh - 1)
    B4 = jnp.take(T2, dy.reshape(-1), axis=0).reshape(wh, wh, ww, ww, nh)
    return B4.transpose(4, 0, 2, 1, 3).reshape(nh, N, N)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: tuple[int, int]
    shift: tuple[int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    mesh: str = "equirectangular"
    use_flash: Optional[Any] = None
    exact_gelu: bool = False
    spmd_mesh: Any = None
    dist_axis: str = "x"

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int, bias: jax.Array):
        # x: [B, H*W, C]; bias: precomputed [nh, N, N] or [nW, nh, N, N]
        B, L, C = x.shape
        wh, ww = self.window
        sh, sw = self.shift
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5)(x).reshape(B, H, W, C)

        # pad to window multiples: circular lon, zero lat (`:220-222`)
        pad_b = (wh - H % wh) % wh
        pad_r = (ww - W % ww) % ww
        if pad_r:
            if self.mesh == "equirectangular":
                x = jnp.concatenate([x, x[:, :, :pad_r]], axis=2)
            else:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_r), (0, 0)))
        if pad_b:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, 0), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if sh or sw:
            x = jnp.roll(x, (-sh, -sw), axis=(1, 2))

        win = window_partition(x, wh, ww)
        win = WindowAttention(
            self.dim, (wh, ww), self.num_heads, self.qkv_bias,
            use_flash=self.use_flash, spmd_mesh=self.spmd_mesh,
            dist_axis=self.dist_axis,
            n_windows=(Hp // wh) * (Wp // ww),
        )(win, bias)
        x = window_reverse(win, wh, ww, Hp, Wp)

        if sh or sw:
            x = jnp.roll(x, (sh, sw), axis=(1, 2))
        x = x[:, :H, :W].reshape(B, H * W, C)

        x = shortcut + x
        x = x + Mlp(int(C * self.mlp_ratio), C, approximate=not self.exact_gelu)(
            nn.LayerNorm(epsilon=1e-5)(x)
        )
        return x


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int):
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(B, -1, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        return nn.Dense(2 * C, use_bias=False, kernel_init=trunc_normal_init())(x)


class SwinTransformer(RolloutModel):
    """Reference `SwinTransformer` (config `type: SwinTransformer`).

    The relative-position bias tables are declared in `setup()` (not inside
    the per-step compact pass) so `precompute()` can expand them to dense
    [nh, N, N] biases ONCE per rollout; under the `lax.scan` rollout XLA
    does not hoist that (large) loop-invariant work itself, and rebuilding
    the biases every step dominated the step time at global-window sizes.
    """

    name: str = "swin"
    img_height: int = 32
    img_width: int = 64
    patch_size: int = 1
    constant_channels: int = 4
    prescribed_channels: int = 0
    prognostic_channels: int = 1
    embed_dim: int = 96
    depths: Sequence[int] = (4, 4)
    num_heads: Sequence[int] = (4, 4)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ape: bool = False
    patch_norm: bool = True
    context_size: int = 1
    mesh: str = "equirectangular"
    # None = auto (Pallas flash kernel only where it wins: large windows);
    # True/False forces the path; a per-stage tuple (e.g. (None, False))
    # selects the impl per stage — the knob the swin_win8@180x360
    # crash bisection uses, and the workaround it concluded with.
    use_flash_attention: Optional[Any] = None
    # False = fast tanh-approx GELU; True = torch-exact erf GELU (parity)
    exact_gelu: bool = False
    # jax Mesh: run every attention ring/context-parallel over `dist_axis`
    # (sequence-sharded tokens; the O(N^2) bias sharded by query rows).
    spmd_mesh: Any = None
    dist_axis: str = "x"
    # None = the reference's GLOBAL windows (window = stage resolution,
    # `swin_transformer.py:561`).  (wh, ww) = fixed local windows — an
    # extension the reference lacks but high resolutions need: at 2.0
    # degrees a global window is N=16200 tokens with O(N^2) bias/scores,
    # while (8, 8) windows keep N=64 and route through the packed kernel.
    window_size: Optional[Sequence[int]] = None

    def _grid_hw(self) -> tuple[int, int]:
        if self.mesh == "healpix":
            # faces arranged 3 rows x 4 cols (`:826-847`)
            return 3 * self.img_height, 4 * self.img_width
        return self.img_height, self.img_width

    def _stage_plan(self):
        """Static per-stage geometry (mirrors the step-time evolution)."""
        H0, W0 = self._grid_hw()
        p = self.patch_size
        H = -(-H0 // p)
        W = -(-W0 // p)
        res_h, res_w = H, W
        plan = []
        for i in range(len(self.depths)):
            if self.window_size is not None:
                # fixed local windows, clamped to the stage resolution
                wh = min(int(self.window_size[0]), res_h)
                ww = min(int(self.window_size[1]), res_w)
            else:
                wh, ww = res_h, res_w
            pad_b = (wh - H % wh) % wh
            pad_r = (ww - W % ww) % ww
            plan.append(
                dict(H=H, W=W, Hp=H + pad_b, Wp=W + pad_r, wh=wh, ww=ww,
                     shift=(wh // 2, ww // 2))
            )
            if i < len(self.depths) - 1:
                H, W = (H + 1) // 2, (W + 1) // 2
                res_h, res_w = res_h // 2, res_w // 2
        return plan

    def setup(self):
        tables = {}
        for i, st in enumerate(self._stage_plan()):
            for d in range(self.depths[i]):
                tables[f"{i}_{d}"] = self.param(
                    f"relative_position_bias_table_{i}_{d}",
                    trunc_normal_init(),
                    ((2 * st["wh"] - 1) * (2 * st["ww"] - 1), self.num_heads[i]),
                )
        self.bias_tables = tables

    def precompute(self):
        """Expand all block biases (+ fold shift masks) once per rollout."""
        aux = {}
        for i, st in enumerate(self._stage_plan()):
            wh, ww = st["wh"], st["ww"]
            for d in range(self.depths[i]):
                rel = expand_relative_bias(
                    self.bias_tables[f"{i}_{d}"], wh, ww
                )
                sh, sw = (0, 0) if d % 2 == 0 else st["shift"]
                if sh or sw:
                    # Only the [nW, N] group ids are baked as a constant;
                    # the dense [nW, N, N] mask is built ON DEVICE (a baked
                    # mask is ~600 MB at N=12288 -> relay HTTP 413).  Mask
                    # in the bias dtype so a f32 mask can't promote the
                    # attention (and the scan carry) to f32 under bf16.
                    groups = jnp.asarray(
                        shift_window_groups(st["Hp"], st["Wp"], wh, ww, sh, sw)
                    )
                    mask = jnp.where(
                        groups[:, None, :] != groups[:, :, None],
                        jnp.asarray(-100.0, rel.dtype),
                        jnp.asarray(0.0, rel.dtype),
                    )
                    aux[f"{i}_{d}"] = rel[None] + mask[:, None]  # [nW,nh,N,N]
                else:
                    aux[f"{i}_{d}"] = rel
        return aux

    @nn.compact
    def step(self, x: jax.Array, state: Any, aux=None) -> tuple[jax.Array, Any]:
        if aux is None:
            aux = self.precompute()
        # HEALPix: [B, F, H, W, C] -> 3x4 rectangle of faces
        if self.mesh == "healpix":
            B, F, H, W, C = x.shape
            x = x.reshape(B, 3, 4, H, W, C).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(B, 3 * H, 4 * W, C)
        B, H0, W0, Cin = x.shape
        p = self.patch_size

        # PatchEmbed (circular-lon pad to patch multiple, conv k=s=p)
        if W0 % p:
            x = jnp.concatenate([x, x[:, :, : p - W0 % p]], axis=2)
        if H0 % p:
            x = jnp.pad(x, ((0, 0), (0, p - H0 % p), (0, 0), (0, 0)))
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID")(x)
        Wh, Ww = x.shape[1], x.shape[2]
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5)(x.reshape(B, -1, self.embed_dim)).reshape(
                B, Wh, Ww, self.embed_dim
            )
        if self.ape:
            pos = self.param(
                "absolute_pos_embed", trunc_normal_init(), (1, Wh, Ww, self.embed_dim)
            )
            x = x + pos
        x = x.reshape(B, Wh * Ww, self.embed_dim)

        # encoder stages with global-size windows, halving resolution
        n_layers = len(self.depths)
        plan = self._stage_plan()
        feats = []
        for i in range(n_layers):
            st = plan[i]
            dim = int(self.embed_dim * 2**i)
            H, W = st["H"], st["W"]
            uf = self.use_flash_attention
            if isinstance(uf, (tuple, list)):
                uf = uf[i]
            for d in range(self.depths[i]):
                blk_shift = (0, 0) if d % 2 == 0 else st["shift"]
                x = SwinBlock(
                    dim,
                    self.num_heads[i],
                    (st["wh"], st["ww"]),
                    blk_shift,
                    self.mlp_ratio,
                    self.qkv_bias,
                    mesh=self.mesh,
                    use_flash=uf,
                    exact_gelu=self.exact_gelu,
                    spmd_mesh=self.spmd_mesh,
                    dist_axis=self.dist_axis,
                )(x, H, W, aux[f"{i}_{d}"])
            x_out = nn.LayerNorm(epsilon=1e-5)(x)
            feats.append(x_out.reshape(B, H, W, dim))
            if i < n_layers - 1:
                x = PatchMerging(dim)(x, H, W)

        # U-Net style ConvTranspose decoder (`:586-607,671-677`)
        feats = feats[::-1]
        y = None
        for idx, i_layer in enumerate(range(n_layers)[::-1]):
            ch = int(self.embed_dim * 2**i_layer)
            x_in = feats[idx] if idx == 0 else jnp.concatenate([feats[idx], y], -1)
            k = p if i_layer == 0 else 2
            out_ch = ch if i_layer == 0 else ch // 2
            y = nn.ConvTranspose(out_ch, (k, k), strides=(k, k), padding="VALID")(x_in)
            y = nn.gelu(y, approximate=not self.exact_gelu)
        out = nn.Conv(self.prognostic_channels, (1, 1))(y)
        out = out[:, : H0, : W0]

        if self.mesh == "healpix":
            Hf, Wf = self.img_height, self.img_width
            out = out.reshape(B, 3, Hf, 4, Wf, self.prognostic_channels)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, 12, Hf, Wf, self.prognostic_channels
            )
        return out, state


class SwinTransformerHPX(SwinTransformer):
    """HEALPix Swin (reference `SwinTransformerHPX`, `:762-879`)."""

    mesh: str = "healpix"
