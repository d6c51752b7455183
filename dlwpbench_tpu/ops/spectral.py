"""Spectral ops: FNO spectral convolution (full + Tucker-factorized) and the
AFNO blockwise frequency-domain MLP filter.

References:
- SpectralConv2d (`models/unet/unet.py:19-69`): rfft2, complex per-mode
  channel mixing on the low-frequency corners ([:m1, :m2] and [-m1:, :m2]),
  irfft2.  Weight init U(0, 1/(Cin*Cout)).
- neuraloperator FNO/TFNO (`models/fno/fno.py:7,38-47`): Tucker-factorized
  complex weights with fractional `rank`.
- AFNO2D (`models/fourcastnet/fourcastnet.py:59-127`): rfft2 (ortho),
  reshape channels into `num_blocks`, two-layer complex MLP with ReLU on the
  kept mode band, softshrink sparsity, irfft2, residual add.

TPU notes: all frequency-domain contractions are expressed as real einsums
(real/imag parts separately) so they lower to MXU matmuls; mode truncation
uses static slices; fp32 accumulation throughout (AFNO upcasts internally
like the reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def softshrink(x: jax.Array, lambd: float) -> jax.Array:
    """torch.nn.functional.softshrink."""
    return jnp.where(x > lambd, x - lambd, jnp.where(x < -lambd, x + lambd, 0.0))


# ---------------------------------------------------------------------------
# Matmul DFTs: rfft2/irfft2 as real einsums on the MXU.
#
# XLA's FFT op on small weather grids is overhead-bound on TPU (and the
# remote relay compiler is fragile around it); an explicit DFT is O(HW(H+W))
# flops of dense matmul — negligible at these sizes and it fuses with the
# surrounding ops.  All arithmetic is real (separate real/imag planes), so
# no complex64 ever crosses the jit boundary.
# ---------------------------------------------------------------------------


def _dft_mats_w(W: int):
    """Ortho rfft matrices over the last spatial axis: x[w] -> X[k]."""
    w = np.arange(W)[:, None]
    k = np.arange(W // 2 + 1)[None, :]
    ang = 2 * np.pi * w * k / W
    cw = (np.cos(ang) / np.sqrt(W)).astype(np.float32)  # [W, Wf]
    sw = (-np.sin(ang) / np.sqrt(W)).astype(np.float32)
    return cw, sw


def _dft_mats_h(H: int):
    """Ortho full-DFT matrices over the H axis: [K, H]."""
    k = np.arange(H)[:, None]
    h = np.arange(H)[None, :]
    ang = 2 * np.pi * k * h / H
    ch = (np.cos(ang) / np.sqrt(H)).astype(np.float32)
    sh = (np.sin(ang) / np.sqrt(H)).astype(np.float32)
    return ch, sh


def _idft_mats_w(W: int):
    """Ortho irfft matrices [Wf, W] with hermitian mode doubling."""
    Wf = W // 2 + 1
    alpha = np.full(Wf, 2.0)
    alpha[0] = 1.0
    if W % 2 == 0:
        alpha[-1] = 1.0
    k = np.arange(Wf)[:, None]
    w = np.arange(W)[None, :]
    ang = 2 * np.pi * k * w / W
    icw = (alpha[:, None] * np.cos(ang) / np.sqrt(W)).astype(np.float32)
    isw = (-alpha[:, None] * np.sin(ang) / np.sqrt(W)).astype(np.float32)
    return icw, isw


def rfft2_matmul(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Ortho rfft2 over axes (1, 2) of [B, H, W, C] via real matmuls.

    Returns (real, imag), each [B, H, W//2+1, C] — numerically the
    jnp.fft.rfft2(..., norm="ortho") spectrum.
    """
    B, H, W, C = x.shape
    cw, sw = (jnp.asarray(m) for m in _dft_mats_w(W))
    ch, sh = (jnp.asarray(m) for m in _dft_mats_h(H))
    xr = jnp.einsum("bhwc,wk->bhkc", x, cw)
    xi = jnp.einsum("bhwc,wk->bhkc", x, sw)
    yr = jnp.einsum("gh,bhkc->bgkc", ch, xr) + jnp.einsum("gh,bhkc->bgkc", sh, xi)
    yi = jnp.einsum("gh,bhkc->bgkc", ch, xi) - jnp.einsum("gh,bhkc->bgkc", sh, xr)
    return yr, yi


def irfft2_matmul(
    yr: jax.Array, yi: jax.Array, H: int, W: int
) -> jax.Array:
    """Inverse of `rfft2_matmul`: [B, H, W//2+1, C] real/imag -> [B, H, W, C]."""
    ch, sh = (jnp.asarray(m) for m in _dft_mats_h(H))
    icw, isw = (jnp.asarray(m) for m in _idft_mats_w(W))
    # ifft over H (adjoint of the ortho forward): (ch + i sh)^T applied
    zr = jnp.einsum("gh,bgkc->bhkc", ch, yr) - jnp.einsum("gh,bgkc->bhkc", sh, yi)
    zi = jnp.einsum("gh,bgkc->bhkc", ch, yi) + jnp.einsum("gh,bgkc->bhkc", sh, yr)
    # irfft over W with hermitian doubling (takes the real part implicitly)
    return jnp.einsum("bhkc,kw->bhwc", zr, icw) + jnp.einsum(
        "bhkc,kw->bhwc", zi, isw
    )


@functools.lru_cache(maxsize=None)
def _band_dft_mats(H: int, W: int, m1: int, m2: int):
    """Truncated ortho rfft2 matrices for FNO's kept corner bands.

    The FNO layer only reads spectral rows [:m1] + [-m1:] and cols [:m2];
    computing just those bands as real matmuls removes the full-spectrum
    FFT, the gather, and the `.at[].set` scatter (and their transposes in
    the backward pass).  Returns (cw, sw, ch, sh, icw, isw):
      W-axis forward [W, m2], H-axis forward rows [2*m1, H],
      W-axis inverse [m2, W] with hermitian doubling.
    """
    w = np.arange(W)[:, None]
    k = np.arange(m2)[None, :]
    angw = 2 * np.pi * w * k / W
    cw = (np.cos(angw) / np.sqrt(W)).astype(np.float32)
    sw = (-np.sin(angw) / np.sqrt(W)).astype(np.float32)
    g = np.concatenate([np.arange(m1), np.arange(H - m1, H)])[:, None]
    h = np.arange(H)[None, :]
    angh = 2 * np.pi * g * h / H
    ch = (np.cos(angh) / np.sqrt(H)).astype(np.float32)
    sh = (np.sin(angh) / np.sqrt(H)).astype(np.float32)
    alpha = np.full(m2, 2.0)
    alpha[0] = 1.0
    if W % 2 == 0 and m2 == W // 2 + 1:
        alpha[-1] = 1.0
    icw = (alpha[:, None] * np.cos(angw.T) / np.sqrt(W)).astype(np.float32)
    isw = (-alpha[:, None] * np.sin(angw.T) / np.sqrt(W)).astype(np.float32)
    return cw, sw, ch, sh, icw, isw


def _tucker_core_dims(dims: tuple[int, ...], rank: float) -> tuple[int, ...]:
    """Core sizes for a float Tucker rank, matching tensorly's
    `validate_tucker_rank` semantics (the rule neuraloperator's TFNO uses,
    reference `models/fno/fno.py:38-47` with rank 0.8): pick one fraction f
    so the factorized parameter count is ~`rank` x the dense tensor's,

        prod(dims) * f^n  +  sum(d_i^2) * f  =  rank * prod(dims),

    then core_dim_i = round(f * d_i).  (A plain per-dim `rank**0.5` rule
    neither matches tensorly nor hits the parameter budget.)"""
    n = len(dims)
    prod = float(np.prod(dims))
    coeffs = np.zeros(n + 1)
    coeffs[0] = prod                      # f^n
    coeffs[-2] = float(sum(d * d for d in dims))  # f^1
    coeffs[-1] = -rank * prod             # f^0
    roots = np.roots(coeffs)
    real = roots[np.isreal(roots)].real
    f = float(min(r for r in real if r > 0))
    return tuple(max(1, int(round(f * d))) for d in dims)


class SpectralConv2d(nn.Module):
    """FNO 2D Fourier layer on channels-last inputs [B, H, W, C].

    Matches the reference SpectralConv2d semantics: keeps modes
    [:m1, :m2] and [-m1:, :m2] of the (full H x half W) rfft2 spectrum and
    mixes channels with complex weights per mode.

    `tucker_rank`: if set (fraction in (0, 1]), the complex weight tensor
    [Cin, Cout, m1, m2] is Tucker-factorized (core + 4 factor matrices, as
    in neuraloperator's TFNO with tensorly); core sizes follow tensorly's
    float-rank parameter-budget rule (see `_tucker_core_dims`: factorized
    params ~= rank x the dense tensor's).  The contraction runs THROUGH
    the factors at call time — the dense weight is never materialized.
    """

    out_channels: int
    modes1: int = 12
    modes2: int = 12
    tucker_rank: float | None = None
    # "matmul" (default): compute ONLY the kept corner bands via truncated
    # real DFT matmuls — no XLA FFT op (overhead-bound at these sizes, see
    # `results/fourcastnet_analysis.md`), no complex dtype, and no
    # full-spectrum scatter in either autodiff direction.  "fft": the
    # jnp.fft.rfft2 path (numerically identical — the per-mode mixing is
    # linear, so the ortho-vs-default norm factor cancels through the
    # inverse).
    fft_impl: str = "matmul"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, Cin = x.shape
        Cout = self.out_channels
        m1, m2 = min(self.modes1, H), min(self.modes2, W // 2 + 1)
        scale = 1.0 / (Cin * Cout)

        def weight(name):
            if self.tucker_rank is None:
                return self.param(
                    name,
                    lambda k: scale
                    * jax.random.uniform(k, (Cin, Cout, m1, m2, 2)),
                )
            # Tucker factorization: core [r0,r1,r2,r3] + factors per dim.
            dims = (Cin, Cout, m1, m2)
            core_dims = _tucker_core_dims(dims, self.tucker_rank)
            core = self.param(
                f"{name}_core",
                lambda k: scale * jax.random.normal(k, (*core_dims, 2)),
            )
            factors = [
                self.param(
                    f"{name}_factor{i}",
                    lambda k, d=d, r=r: jax.random.normal(k, (d, r))
                    / np.sqrt(r),
                )
                for i, (d, r) in enumerate(zip(dims, core_dims))
            ]
            return (core, factors)

        w1 = weight("weights1")
        w2 = weight("weights2")

        def mix_real(br, bi, w):
            # (br, bi): [B, m1, m2, Cin] real/imag planes of the band.
            # Complex mixing is packed into ONE einsum per band (instead of
            # four): batch-1 ladder rungs are latency-bound on op count, and
            # XLA hoists the weight-only subcontractions out of the rollout
            # scan.
            if isinstance(w, tuple):
                core, (fi, fo, fx, fy) = w
                # bb[s], cc[t]: the four real products land on (s, t); the
                # complex combine is two adds on the [2, 2, ...] result.
                bb = jnp.stack([br, bi])  # [2, B, m1, m2, Cin]
                cc = jnp.moveaxis(core, -1, 0)  # [2, r0, r1, r2, r3]
                t = jnp.einsum(
                    "sbxyi,twquv,iw,oq,xu,yv->stbxyo",
                    bb, cc, fi, fo, fx, fy, optimize=True,
                )
                return t[0, 0] - t[1, 1], t[0, 1] + t[1, 0]
            wr, wi = w[..., 0], w[..., 1]
            # Four separate einsums, NOT a packed [[wr, wi], [-wi, wr]]
            # block GEMM: packing materializes a 4x weight tensor per band
            # whose HBM traffic outweighs the saved dispatches (measured on
            # the analogous SFNO per-degree mixing: 1.4x slower at 128M).
            return (
                jnp.einsum("bxyi,ioxy->bxyo", br, wr)
                - jnp.einsum("bxyi,ioxy->bxyo", bi, wi),
                jnp.einsum("bxyi,ioxy->bxyo", br, wi)
                + jnp.einsum("bxyi,ioxy->bxyo", bi, wr),
            )

        if self.fft_impl == "matmul" and 2 * m1 <= H:
            cw, sw, ch, sh, icw, isw = (
                jnp.asarray(m) for m in _band_dft_mats(H, W, m1, m2)
            )
            xf = x.astype(jnp.float32)
            xr = jnp.einsum("bhwc,wk->bhkc", xf, cw)  # [B, H, m2, C]
            xi = jnp.einsum("bhwc,wk->bhkc", xf, sw)
            yr = jnp.einsum("gh,bhkc->bgkc", ch, xr) + jnp.einsum(
                "gh,bhkc->bgkc", sh, xi
            )
            yi = jnp.einsum("gh,bhkc->bgkc", ch, xi) - jnp.einsum(
                "gh,bhkc->bgkc", sh, xr
            )
            tr, ti = mix_real(yr[:, :m1], yi[:, :m1], w1)
            br_, bi_ = mix_real(yr[:, m1:], yi[:, m1:], w2)
            or_ = jnp.concatenate([tr, br_], axis=1)  # [B, 2*m1, m2, Cout]
            oi_ = jnp.concatenate([ti, bi_], axis=1)
            zr = jnp.einsum("gh,bgkc->bhkc", ch, or_) - jnp.einsum(
                "gh,bgkc->bhkc", sh, oi_
            )
            zi = jnp.einsum("gh,bgkc->bhkc", ch, oi_) + jnp.einsum(
                "gh,bgkc->bhkc", sh, or_
            )
            out = jnp.einsum("bhkc,kw->bhwc", zr, icw) + jnp.einsum(
                "bhkc,kw->bhwc", zi, isw
            )
            return out.astype(x.dtype)

        x_ft = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))  # [B,H,Wf,C]

        def mix(block, w):
            # block: [B, m1, m2, Cin] complex
            if isinstance(w, tuple):
                # Tucker path: contract THROUGH the factors — the dense
                # [Cin, Cout, m1, m2] weight is never materialized (its
                # reconstruction costs ~r0 x the apply itself and dominated
                # the TFNO train step at 64M+ params).  opt_einsum picks
                # the factored contraction order.
                core, (fi, fo, fx, fy) = w
                cc = core[..., 0] + 1j * core[..., 1]
                # core dims w,q,u,v = (r_in, r_out, r_m1, r_m2)
                return jnp.einsum(
                    "bxyi,wquv,iw,oq,xu,yv->bxyo",
                    block, cc, fi, fo, fx, fy, optimize=True,
                )
            wc = w[..., 0] + 1j * w[..., 1]
            return jnp.einsum("bxyi,ioxy->bxyo", block, wc)

        top = mix(x_ft[:, :m1, :m2, :], w1)
        bot = mix(x_ft[:, H - m1 :, :m2, :], w2)

        out_ft = jnp.zeros((B, H, W // 2 + 1, Cout), jnp.complex64)
        out_ft = out_ft.at[:, :m1, :m2].set(top)
        out_ft = out_ft.at[:, H - m1 :, :m2].set(bot)
        out = jnp.fft.irfft2(out_ft, s=(H, W), axes=(1, 2))
        return out.astype(x.dtype)


class AFNO2DFilter(nn.Module):
    """AFNO frequency-domain blockwise MLP (reference `fourcastnet.py:59-127`).

    Operates on [B, H, W, C] token grids; returns filtered + residual.
    """

    hidden_size: int
    num_blocks: int = 8
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0
    hidden_size_factor: int = 1
    spmd_mesh: object = None  # jax Mesh: run over the distributed rFFT2
    dist_axis: str = "x"
    # "matmul" (default): DFT as real einsums + packed complex block-GEMMs —
    # the whole filter lowers to MXU matmuls (XLA's FFT op is
    # overhead-bound at weather-grid sizes).  "fft": jnp.fft path.
    fft_impl: str = "matmul"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.hidden_size % self.num_blocks == 0
        nb = self.num_blocks
        bs = self.hidden_size // nb
        bf = bs * self.hidden_size_factor
        scale = 0.02
        w1 = self.param("w1", lambda k: scale * jax.random.normal(k, (2, nb, bs, bf)))
        b1 = self.param("b1", lambda k: scale * jax.random.normal(k, (2, nb, bf)))
        w2 = self.param("w2", lambda k: scale * jax.random.normal(k, (2, nb, bf, bs)))
        b2 = self.param("b2", lambda k: scale * jax.random.normal(k, (2, nb, bs)))

        if self.spmd_mesh is None and self.fft_impl == "matmul":
            return self._matmul_filter(x, nb, bs, bf, w1, b1, w2, b2)

        if self.spmd_mesh is not None:
            from dlwpbench_tpu.parallel.spectral_dist import make_dist_afno_filter

            f = make_dist_afno_filter(
                self.spmd_mesh,
                ndim=x.ndim,
                axis_name=self.dist_axis,
                hard_thresholding_fraction=self.hard_thresholding_fraction,
                sparsity_threshold=self.sparsity_threshold,
            )
            return f(x, w1, b1, w2, b2).astype(x.dtype) + x

        bias = x
        dtype = x.dtype
        B, H, W, C = x.shape
        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        xf = xf.reshape(B, H, W // 2 + 1, nb, bs)

        total_modes = H // 2 + 1
        kept = int(total_modes * self.hard_thresholding_fraction)
        # The reference's band: rows [total-kept : total+kept], cols [:kept]
        r0, r1 = total_modes - kept, min(total_modes + kept, H)
        sl = xf[:, r0:r1, :kept]

        def blockmm(a, w):
            return jnp.einsum("...bi,bio->...bo", a, w)

        o1r = jax.nn.relu(
            blockmm(sl.real, w1[0]) - blockmm(sl.imag, w1[1]) + b1[0]
        )
        o1i = jax.nn.relu(
            blockmm(sl.imag, w1[0]) + blockmm(sl.real, w1[1]) + b1[1]
        )
        o2r = blockmm(o1r, w2[0]) - blockmm(o1i, w2[1]) + b2[0]
        o2i = blockmm(o1i, w2[0]) + blockmm(o1r, w2[1]) + b2[1]

        out_r = jnp.zeros((B, H, W // 2 + 1, nb, bs), jnp.float32)
        out_i = jnp.zeros((B, H, W // 2 + 1, nb, bs), jnp.float32)
        out_r = out_r.at[:, r0:r1, :kept].set(o2r)
        out_i = out_i.at[:, r0:r1, :kept].set(o2i)

        out_r = softshrink(out_r, self.sparsity_threshold)
        out_i = softshrink(out_i, self.sparsity_threshold)
        xf = (out_r + 1j * out_i).reshape(B, H, W // 2 + 1, C)
        out = jnp.fft.irfft2(xf, s=(H, W), axes=(1, 2), norm="ortho")
        return out.astype(dtype) + bias

    def _matmul_filter(self, x, nb, bs, bf, w1, b1, w2, b2):
        """AFNO entirely as MXU matmuls: DFT-by-einsum spectrum + the
        two-layer complex block-MLP packed into real GEMMs
        ([Ar, Ai] @ [[W0, W1], [-W1, W0]] = [Or, Oi], K/N doubled), so no
        FFT op, no complex dtype, 4x larger GEMM tiles than the per-plane
        einsum formulation."""
        bias = x
        dtype = x.dtype
        B, H, W, C = x.shape
        Wf = W // 2 + 1
        yr, yi = rfft2_matmul(x.astype(jnp.float32))  # [B, H, Wf, C]

        total_modes = H // 2 + 1
        kept = int(total_modes * self.hard_thresholding_fraction)
        r0, r1 = total_modes - kept, min(total_modes + kept, H)
        sl_r = yr[:, r0:r1, :kept].reshape(B, r1 - r0, kept, nb, bs)
        sl_i = yi[:, r0:r1, :kept].reshape(B, r1 - r0, kept, nb, bs)

        def pack_w(w):  # [2, nb, i, o] -> [nb, 2i, 2o]
            w0, wim = w[0], w[1]
            top = jnp.concatenate([w0, wim], axis=-1)  # [nb, i, 2o]
            bot = jnp.concatenate([-wim, w0], axis=-1)
            return jnp.concatenate([top, bot], axis=-2)  # [nb, 2i, 2o]

        a = jnp.concatenate([sl_r, sl_i], axis=-1)  # [B, r, k, nb, 2bs]
        o1 = jax.nn.relu(
            jnp.einsum("...bi,bio->...bo", a, pack_w(w1))
            + jnp.concatenate([b1[0], b1[1]], -1)
        )
        o2 = jnp.einsum("...bi,bio->...bo", o1, pack_w(w2)) + jnp.concatenate(
            [b2[0], b2[1]], -1
        )
        o2r, o2i = o2[..., :bs], o2[..., bs:]

        out_r = jnp.zeros((B, H, Wf, nb, bs), jnp.float32)
        out_i = jnp.zeros((B, H, Wf, nb, bs), jnp.float32)
        out_r = out_r.at[:, r0:r1, :kept].set(softshrink(o2r, self.sparsity_threshold))
        out_i = out_i.at[:, r0:r1, :kept].set(softshrink(o2i, self.sparsity_threshold))
        out = irfft2_matmul(
            out_r.reshape(B, H, Wf, C), out_i.reshape(B, H, Wf, C), H, W
        )
        return out.astype(dtype) + bias
