"""Fused (flash-style) window attention Pallas kernel for TPU.

The reference's attention models (Swin `swin_transformer.py:74-154`, Pangu
EarthAttention3D) materialize [heads, N, N] score tensors through cuBLAS;
with the reference's *global-size* windows (window = full resolution, N up
to H*W = 2048+) that is the dominant HBM traffic.  This kernel computes

    O = softmax(Q K^T * scale + bias) V

with the online-softmax (FlashAttention) recurrence: Q blocks stay resident
in VMEM while K/V/bias stream through, so the [N, N] score matrix never
touches HBM.  `bias` carries the relative-position bias (+ any additive
shift mask folded in by the caller) per head, broadcast over batch.

Falls back to a reference jnp implementation off-TPU (also used as the
oracle in tests; `interpret=True` exercises the kernel on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def reference_attention(q, k, v, bias, scale):
    """Oracle: q,k,v [B, H, N, D]; bias [H, N, N] or [G, H, N, N] with the
    window/group index = b % G -> [B, H, N, D]."""
    if bias.ndim == 3:
        s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k) + bias[None]
    else:
        B = q.shape[0]
        G = bias.shape[0]
        b = jnp.tile(bias, (B // G, 1, 1, 1))
        s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k) + b
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def _attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale, block_k, n_kv
):
    # block shapes: q [1,1,block_q,D]; k/v [1,1,N,D]; bias [1,1,block_q,N];
    # lse out [1,1,block_q,1] (log-sum-exp per row, consumed by the flash
    # backward kernels)
    q = q_ref[0, 0] * scale
    D = q.shape[-1]
    bq = q.shape[0]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, 0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        b_blk = bias_ref[0, 0, :, pl.ds(i * block_k, block_k)]
        s = (
            jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_blk
        )
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, D), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def _flash_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        interpret = True  # CPU/GPU: run the kernel through the interpreter
    B, H, N, D = q.shape
    scale = D**-0.5
    block_q = min(block_q, N)
    block_k = min(block_k, N)
    assert N % block_q == 0 and N % block_k == 0, (N, block_q, block_k)

    if bias.ndim == 3:
        bias = bias[None]  # [1, H, N, N]
    G = bias.shape[0]
    assert B % G == 0, (B, G)

    grid = (B, H, N // block_q)
    kernel = functools.partial(
        _attn_kernel, scale=scale, block_k=block_k, n_kv=N // block_k
    )
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, N, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, N, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, N, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, block_q, N), lambda b, h, i: (jax.lax.rem(b, G), h, i, 0)
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0)),
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out, lse


def _bwd_dq_dbias_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, drow_ref,
    dq_ref, dbias_ref, *, scale, block_k, n_kv, n_member,
):
    """dQ + dBias, grid (G, H, Nq_blocks, B//G) — the member index j is the
    INNERMOST (sequential) grid dim, so the dbias output block (indexed by
    (g, h, i) only) is revisited on consecutive steps and accumulates the
    group's dS sum; dq is per-batch (b = g + j*G) and written once."""
    j = pl.program_id(3)
    q = q_ref[0, 0] * scale
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # [bq, 1]
    drow = drow_ref[0, 0]  # [bq, 1]
    D = q.shape[-1]
    bq = q.shape[0]

    @pl.when(j == 0)
    def _init():
        dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    def body(i, dq_acc):
        k_blk = k_ref[0, 0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        b_blk = bias_ref[0, 0, :, pl.ds(i * block_k, block_k)]
        s = (
            jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_blk
        )
        p = jnp.exp(s - lse)  # [bq, bk]
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - drow)
        sl = pl.ds(i * block_k, block_k)
        dbias_ref[0, 0, :, sl] = dbias_ref[0, 0, :, sl] + ds
        return dq_acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, n_kv, body, jnp.zeros((bq, D), jnp.float32))
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, drow_ref,
    dk_ref, dv_ref, *, scale, block_q, n_q,
):
    """dK + dV, grid (B, H, Nk_blocks): k/v blocks resident, q/dO stream."""
    k_blk = k_ref[0, 0]  # [bk, D]
    v_blk = v_ref[0, 0]
    D = k_blk.shape[-1]
    bk = k_blk.shape[0]

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[0, 0, pl.ds(i * block_q, block_q), :] * scale
        do_blk = do_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse_blk = lse_ref[0, 0, pl.ds(i * block_q, block_q), :]
        drow_blk = drow_ref[0, 0, pl.ds(i * block_q, block_q), :]
        b_blk = bias_ref[0, 0, pl.ds(i * block_q, block_q), :]
        s = (
            jax.lax.dot_general(
                q_blk, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_blk
        )
        p = jnp.exp(s - lse_blk)  # [bq, bk]
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - drow_blk)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    z = jnp.zeros((bk, D), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_q, body, (z, z))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)  # q already carried `scale`
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_diff(q, k, v, bias, block_q, block_k, interpret):
    out, _ = _flash_impl(
        q, k, v, bias, block_q=block_q, block_k=block_k, interpret=interpret
    )
    return out


def _flash_fwd(q, k, v, bias, block_q, block_k, interpret):
    out, lse = _flash_impl(
        q, k, v, bias, block_q=block_q, block_k=block_k, interpret=interpret
    )
    return out, (q, k, v, bias, out, lse)


def _flash_bwd(block_q, block_k, interpret, res, g):
    """Fused flash backward: three Pallas passes (fwd-with-lse residuals,
    dQ+dBias, dK+dV) — the [N, N] score matrix never touches HBM in the
    backward either.  dBias sums dS over each bias group's batch members
    inside the kernel via grid-revisit accumulation."""
    q, k, v, bias, out, lse = res
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    B, H, N, D = q.shape
    scale = D**-0.5
    block_q = min(block_q, N)
    block_k = min(block_k, N)

    bias_was_3d = bias.ndim == 3
    bias4 = bias[None] if bias_was_3d else bias
    G = bias4.shape[0]

    do = g
    drow = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # [B, H, N, 1]

    # --- dQ + dBias ---------------------------------------------------
    grid1 = (G, H, N // block_q, B // G)
    k1 = functools.partial(
        _bwd_dq_dbias_kernel, scale=scale, block_k=block_k,
        n_kv=N // block_k, n_member=B // G,
    )
    b_idx = lambda gi, h, i, j: (gi + j * G, h, i, 0)
    bn_idx = lambda gi, h, i, j: (gi + j * G, h, 0, 0)
    dq, dbias = pl.pallas_call(
        k1,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            jax.ShapeDtypeStruct((G, H, N, N), jnp.float32),
        ),
        grid=grid1,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), b_idx),   # q
            pl.BlockSpec((1, 1, N, D), bn_idx),        # k
            pl.BlockSpec((1, 1, N, D), bn_idx),        # v
            pl.BlockSpec((1, 1, block_q, N), lambda gi, h, i, j: (gi, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, D), b_idx),   # dO
            pl.BlockSpec((1, 1, block_q, 1), b_idx),   # lse
            pl.BlockSpec((1, 1, block_q, 1), b_idx),   # drow
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), b_idx),
            pl.BlockSpec((1, 1, block_q, N), lambda gi, h, i, j: (gi, h, i, 0)),
        ),
        interpret=interpret,
    )(q, k, v, bias4, do, lse, drow)

    # --- dK + dV ------------------------------------------------------
    grid2 = (B, H, N // block_k)
    k2 = functools.partial(
        _bwd_dkv_kernel, scale=scale, block_q=block_q, n_q=N // block_q
    )
    full = lambda b, h, i: (b, h, 0, 0)
    blk = lambda b, h, i: (b, h, i, 0)
    dk, dv = pl.pallas_call(
        k2,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, N, D), v.dtype),
        ),
        grid=grid2,
        in_specs=[
            pl.BlockSpec((1, 1, N, D), full),          # q
            pl.BlockSpec((1, 1, block_k, D), blk),     # k
            pl.BlockSpec((1, 1, block_k, D), blk),     # v
            pl.BlockSpec(
                (1, 1, N, block_k), lambda b, h, i: (jax.lax.rem(b, G), h, 0, i)
            ),
            pl.BlockSpec((1, 1, N, D), full),          # dO
            pl.BlockSpec((1, 1, N, 1), full),          # lse
            pl.BlockSpec((1, 1, N, 1), full),          # drow
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, D), blk),
            pl.BlockSpec((1, 1, block_k, D), blk),
        ),
        interpret=interpret,
    )(q, k, v, bias4, do, lse, drow)

    dbias = dbias.astype(bias.dtype)
    if bias_was_3d:
        dbias = dbias[0]
    return dq, dk, dv, dbias


_flash_diff.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Packed small-window attention (Pangu-style tiny windows)
# ---------------------------------------------------------------------------
#
# Pangu's EarthAttention3D at 5.625 deg has windows of N = 144 tokens and
# thousands of independent (batch, lon-group, window, head) problems per
# layer (`models/pangu.py`; reference `panguweather.py:133-211`).  The flash
# kernel above is built for LARGE N (streamed K/V); at N = 144 its grid
# degenerates into thousands of near-empty programs, while the einsum path
# materializes [B*nLon, nh, nW, N, N] score tensors (~0.5 GB/layer at batch
# 32) through HBM.
#
# This kernel packs ALL heads of one (batch, lon, window) triple into one
# program: q/k/v/bias/scores stay resident in VMEM (N*N fits easily), the
# softmax is a plain two-pass over a resident [N, N] tile, and the backward
# is a SINGLE fused kernel producing dQ, dK, dV and the accumulated dBias —
# no [N, N] tensor ever touches HBM in either direction.


def _packed_attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref,
                        o_ref, lse_ref, *, scale, nh):
    """All tensors live in the TRANSPOSED layout: q/k/v/o [1, nh, D, N],
    bias/mask [.., Nkey, Nquery], lse [1, nh, 1, N].  The head dim D (16/32)
    would pad 8x to the 128-lane tile as a minor dim; with N minor the
    padding is 144->256 and the per-row softmax stats are lane vectors."""
    m = mask_ref[0, 0]  # [Nk, Nq], zeros when unmasked
    for h in range(nh):
        q = q_ref[0, h] * scale  # [D, Nq]
        k = k_ref[0, h]          # [D, Nk]
        s = (
            jax.lax.dot_general(   # [Nk, Nq]
                k, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias_ref[0, h]
            + m
        )
        mx = jnp.max(s, axis=0, keepdims=True)   # [1, Nq]
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=0, keepdims=True)
        o = jax.lax.dot_general(   # [D, Nq]
            v_ref[0, h], p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = (o / l).astype(o_ref.dtype)
        lse_ref[0, h] = mx + jnp.log(l)


def _packed_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                       lse_ref, drow_ref, dq_ref, dk_ref, dv_ref, dbias_ref,
                       *, scale):
    """Grid (nW, nh, B_) with the batch member j innermost: the dbias block
    (indexed by (w, h) only) is revisited on consecutive steps and
    accumulates the window's dS sum over all batch members (same
    grid-revisit pattern as `_bwd_dq_dbias_kernel`).  One head per program
    keeps the VMEM footprint small (a fused-heads variant at nh=12,
    N=144 exceeds the 16 MB scoped-VMEM limit once blocks are
    double-buffered)."""
    j = pl.program_id(2)
    m = mask_ref[0, 0]

    @pl.when(j == 0)
    def _init():
        dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    q = q_ref[0, 0]   # [D, Nq]
    k = k_ref[0, 0]   # [D, Nk]
    v = v_ref[0, 0]   # [D, Nk]
    do = do_ref[0, 0].astype(jnp.float32)  # [D, Nq]
    s = (
        jax.lax.dot_general(   # [Nk, Nq]
            k, q * scale, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias_ref[0, 0]
        + m
    )
    p = jnp.exp(s - lse_ref[0, 0])  # normalized probs [Nk, Nq]
    dp = jax.lax.dot_general(       # [Nk, Nq]
        v, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - drow_ref[0, 0])  # [Nk, Nq]
    dbias_ref[0, 0] = dbias_ref[0, 0] + ds
    dq_ref[0, 0] = (
        scale
        * jax.lax.dot_general(      # [D, Nq]
            k, ds, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] = (
        scale
        * jax.lax.dot_general(      # [D, Nk]
            q, ds, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).astype(dk_ref.dtype)
    dv_ref[0, 0] = jax.lax.dot_general(  # [D, Nk]
        do, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _packed_impl(qt, kt, vt, bias_t, mask_t, interpret=False):
    """Transposed layouts throughout: qt/kt/vt [BW, nh, D, N],
    bias_t [nW, nh, Nk, Nq], mask_t [nLon, nW, Nk, Nq].
    Returns (out_t [BW, nh, D, N], lse [BW, nh, 1, N])."""
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    BW, nh, D, N = qt.shape
    nW = bias_t.shape[0]
    nLon = mask_t.shape[0]
    scale = D**-0.5
    kernel = functools.partial(_packed_attn_kernel, scale=scale, nh=nh)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((BW, nh, D, N), qt.dtype),
            jax.ShapeDtypeStruct((BW, nh, 1, N), jnp.float32),
        ),
        grid=(BW,),
        in_specs=[
            pl.BlockSpec((1, nh, D, N), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, nh, D, N), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, nh, D, N), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(
                (1, nh, N, N), lambda i: (jax.lax.rem(i, nW), 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, N, N),
                lambda i: (
                    jax.lax.rem(jax.lax.div(i, nW), nLon),
                    jax.lax.rem(i, nW), 0, 0,
                ),
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, nh, D, N), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, nh, 1, N), lambda i: (i, 0, 0, 0)),
        ),
        interpret=interpret,
    )(qt, kt, vt, bias_t, mask_t)
    return out, lse


def _t(x):
    """Swap the two trailing axes."""
    return jnp.swapaxes(x, -1, -2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _packed_diff(q, k, v, bias, mask, interpret):
    out_t, _ = _packed_impl(
        _t(q), _t(k), _t(v), _t(bias), _t(mask), interpret=interpret
    )
    return _t(out_t)


def _packed_fwd(q, k, v, bias, mask, interpret):
    qt, kt, vt, bias_t, mask_t = _t(q), _t(k), _t(v), _t(bias), _t(mask)
    out_t, lse = _packed_impl(qt, kt, vt, bias_t, mask_t, interpret=interpret)
    return _t(out_t), (qt, kt, vt, bias_t, mask_t, out_t, lse)


def _packed_bwd(interpret, res, g):
    qt, kt, vt, bias_t, mask_t, out_t, lse = res
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    BW, nh, D, N = qt.shape
    nW = bias_t.shape[0]
    nLon = mask_t.shape[0]
    B_ = BW // nW
    scale = D**-0.5
    do = _t(g)  # [BW, nh, D, N]
    drow = jnp.sum(
        do.astype(jnp.float32) * out_t.astype(jnp.float32), axis=-2,
        keepdims=True,
    )  # [BW, nh, 1, N]

    kernel = functools.partial(_packed_bwd_kernel, scale=scale)
    blk = lambda w, h, j: (j * nW + w, h, 0, 0)
    wh = lambda w, h, j: (w, h, 0, 0)
    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((BW, nh, D, N), qt.dtype),
            jax.ShapeDtypeStruct((BW, nh, D, N), kt.dtype),
            jax.ShapeDtypeStruct((BW, nh, D, N), vt.dtype),
            jax.ShapeDtypeStruct((nW, nh, N, N), jnp.float32),
        ),
        grid=(nW, nh, B_),  # j innermost -> sequential dbias revisit
        in_specs=[
            pl.BlockSpec((1, 1, D, N), blk),      # q
            pl.BlockSpec((1, 1, D, N), blk),      # k
            pl.BlockSpec((1, 1, D, N), blk),      # v
            pl.BlockSpec((1, 1, N, N), wh),       # bias (transposed)
            pl.BlockSpec(
                (1, 1, N, N),
                lambda w, h, j: (jax.lax.rem(j, nLon), w, 0, 0),
            ),
            pl.BlockSpec((1, 1, D, N), blk),      # dO
            pl.BlockSpec((1, 1, 1, N), blk),      # lse
            pl.BlockSpec((1, 1, 1, N), blk),      # drow
        ],
        out_specs=(
            pl.BlockSpec((1, 1, D, N), blk),
            pl.BlockSpec((1, 1, D, N), blk),
            pl.BlockSpec((1, 1, D, N), blk),
            pl.BlockSpec((1, 1, N, N), wh),
        ),
        interpret=interpret,
    )(qt, kt, vt, bias_t, mask_t, do, lse, drow)
    return (
        _t(dq), _t(dk), _t(dv),
        _t(dbias).astype(bias_t.dtype),
        jnp.zeros(
            (nLon, nW) + mask_t.shape[2:][::-1], dtype=mask_t.dtype
        ),
    )


_packed_diff.defvjp(_packed_fwd, _packed_bwd)


def packed_window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention for MANY SMALL windows (Pangu earth attention).

    q, k, v: [B_*nW, nh, N, D] laid out so that problem p = b_*nW + w with
    b_ = sample*nLon + lon (the `window_partition_3d` batch layout).
    bias:    [nW, nh, N, N] per-window-type earth-position bias (selected as
             w = p % nW inside the kernel).
    mask:    [nLon, nW, N, N] additive shift mask or None (selected as
             lon = (p // nW) % nLon).

    Returns [B_*nW, nh, N, D].  Differentiable (fused backward incl. the
    bias cotangent, summed over batch members in-kernel); the mask is
    treated as a constant (zero cotangent).
    """
    if mask is None:
        N = q.shape[-2]
        mask = jnp.zeros((1, 1, N, N), q.dtype)
    return _packed_diff(q, k, v, bias, mask, interpret)


def flash_window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """q, k, v: [B, H, N, D]; bias: [H, N, N] (broadcast over B) or
    [G, H, N, N] with per-window bias selected as window = b % G.

    The grouped form covers shifted multi-window attention (Swin `nW > 1`:
    batch laid out as b = sample*nW + window, mask folded into bias[w]) and
    Pangu's per-window-type earth bias (b = ((sample*nLon)+lon)*nW + w with
    bias [nLon*nW, H, N, N] -> group index lon*nW + w = b % G).

    Differentiable: a custom VJP recomputes the einsum attention in the
    backward pass (flash forward, standard backward).

    Any N is supported: Mosaic requires every block on the minor (lane)
    axis — and every in-kernel dynamic slice offset along it — to be
    128-aligned, so when N is not a multiple of 128 (odd grids, e.g. the
    2.0-degree 90x180 global window N = 16200) the inputs are padded to
    the next multiple with -1e9 bias columns for the phantom keys (their
    softmax weight underflows to 0) and the output rows sliced back.
    <=0.8% overhead at the shapes this triggers on; gradients flow through
    jnp.pad's slice adjoint, so dBias keeps its exact shape.
    """
    N = q.shape[2]
    aligned = lambda b: b % 128 == 0 or b == N
    if interpret or (
        N % 128 == 0
        and N % min(block_q, N) == 0
        and N % min(block_k, N) == 0
        and aligned(min(block_q, N))
        and aligned(min(block_k, N))
    ):
        return _flash_diff(q, k, v, bias, block_q, block_k, interpret)

    pad = (-N) % 128
    Np = N + pad
    bq = 256 if Np % 256 == 0 else 128
    spatial = ((0, 0),) * (q.ndim - 2) + ((0, pad), (0, 0))
    qp, kp, vp = (jnp.pad(x, spatial) for x in (q, k, v))
    bias_pad = ((0, 0),) * (bias.ndim - 2) + ((0, pad), (0, pad))
    biasp = jnp.pad(bias, bias_pad)
    if pad:
        # mask the phantom keys for every (real or phantom) query row
        biasp = biasp.at[..., :, N:].set(-1e9)
    out = _flash_diff(qp, kp, vp, biasp, bq, bq, interpret)
    return out[..., :N, :]
