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
from jax.experimental.pallas import tpu as pltpu

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


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_block(n: int, cap: int = 256) -> int:
    """Block size for one attention axis: the whole axis when it is small
    (block == dim is always legal), else a 128-multiple `cdiv` grid with the
    tail handled by in-kernel iota masking."""
    if n <= cap and (n <= 128 or n % 128 == 0):
        return n
    return cap if n % cap == 0 or n > 2 * cap else 128


def _col_mask(j, bk, n_valid, rows):
    """[rows, bk] bool: global key-column index < n_valid (tail masking)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1) + j * bk
    return col < n_valid


def _panel_blocks(n: int, d: int) -> tuple[int, int] | None:
    """(block_q, block_k) for the resident-panel kernels, or None when the
    K/V/bias panels would not fit VMEM (~16 MB/core, x2 grid buffering).

    The panel form keeps whole [N, D] K/V panels + a [block_q, N] bias panel
    in VMEM and sweeps k with an in-kernel fori_loop whose online-softmax
    carry stays in vector registers — measured 1.9x over the grid-block
    streaming form at Swin's global-window shape (N=2048, D=32), where the
    per-k-block grid turnover and scratch round-trips dominate.  Streaming
    remains the fallback for unaligned or VMEM-overflowing N."""
    if n % 128 != 0:
        return None
    # Mosaic double-buffers every grid-indexed input and pads the head dim
    # to the 128-lane tile, so the binding constraint is the PADDED K/V
    # panel: n * round_up(d, 128).  1 MB (N=2048 at d<=128) is measured
    # safe for fwd AND both backward kernels; N=4096 at d=24 (1.9 MB
    # padded) overflows the 16 MB scoped-vmem stack.
    d_pad = -(-d // 128) * 128
    if n * d_pad * 4 > 2**20:
        return None
    for bq in (256, 128):
        if n % bq == 0:
            bk = 256 if n % 256 == 0 else 128
            return bq, bk
    return None


def _attn_kernel_panel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale, block_k, n_kv
):
    """Resident-panel forward: grid (B, H, Nq); K/V arrive as whole [N, D]
    panels, bias as a [block_q, N] panel; the k sweep is an in-kernel
    fori_loop whose (acc, m, l) carry lives in registers."""
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
    # stats stored lane-major [B, H, 1, N] (the packed kernel's proven
    # layout): a trailing singleton dim would tile-pad 128x in HBM
    # (measured: 243 MB for 1.9 MB of stats at Pangu batch-32 shapes);
    # lane-major pads only 8x sublanes on a tiny tensor, and the
    # [bq,1]->[1,bq] relayout here is cheap
    lse_ref[0, 0] = (m + jnp.log(l)).T


def _attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale, block_k, n_kv, n_valid, k_tail
):
    """Streaming forward: grid (B, H, Nq_blocks, Nk_blocks), k innermost.
    K/V/bias arrive as grid blocks (no in-kernel dynamic slices, so N need
    not be 128-aligned: the tail block's out-of-bounds lanes are masked with
    iota — no host-side padding of any operand).  The online-softmax state
    (acc, running max m, running sum l) lives in VMEM scratch across the
    k sweep; outputs are written on the last k step."""
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0] * scale
    k_blk = k_ref[0, 0]
    v_blk = v_ref[0, 0]
    bq = q.shape[0]
    s = (
        jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias_ref[0, 0]
    )
    if k_tail:
        # tail block: out-of-bounds key columns read unspecified memory;
        # force their scores to -inf (select also kills any NaN) and zero
        # the phantom V rows so p=0 times garbage can't poison the
        # accumulator (0 * NaN = NaN).
        s = jnp.where(_col_mask(j, block_k, n_valid, bq), s, NEG_INF)
        krow = jax.lax.broadcasted_iota(
            jnp.int32, v_blk.shape, 0
        ) + j * block_k
        v_blk = jnp.where(krow < n_valid, v_blk, 0.0)

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_kv - 1)
    def _flush():
        o_ref[0, 0] = (acc_ref[...] / l_new).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_new + jnp.log(l_new)).T  # lane-major, see panel


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

    if bias.ndim == 3:
        bias = bias[None]  # [1, H, N, N]
    G = bias.shape[0]
    assert B % G == 0, (B, G)

    panel = _panel_blocks(N, D)
    if panel is not None:
        pbq, pbk = min(panel[0], N), min(panel[1], N)
        out, lse = pl.pallas_call(
            functools.partial(
                _attn_kernel_panel, scale=scale, block_k=pbk,
                n_kv=N // pbk,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
                jax.ShapeDtypeStruct((B, H, 1, N), jnp.float32),
            ),
            grid=(B, H, N // pbq),
            in_specs=[
                pl.BlockSpec((1, 1, pbq, D), lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((1, 1, N, D), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, N, D), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec(
                    (1, 1, pbq, N),
                    lambda b, h, i: (jax.lax.rem(b, G), h, i, 0),
                ),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, pbq, D), lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((1, 1, 1, pbq), lambda b, h, i: (b, h, 0, i)),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            interpret=interpret,
        )(q, k, v, bias)
        return out, lse

    block_q = _pick_block(min(block_q, N))
    block_k = _pick_block(min(block_k, N))
    nq, nk = _cdiv(N, block_q), _cdiv(N, block_k)
    k_tail = N % block_k != 0

    grid = (B, H, nq, nk)
    kernel = functools.partial(
        _attn_kernel, scale=scale, block_k=block_k, n_kv=nk,
        n_valid=N, k_tail=k_tail,
    )
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, N), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec(
                (1, 1, block_q, block_k),
                lambda b, h, i, j: (jax.lax.rem(b, G), h, i, j),
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec(
                (1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, i)
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out, lse


def _bwd_dq_dbias_kernel_panel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, drow_ref,
    dq_ref, dbias_ref, *, scale, block_k, n_kv, n_member,
):
    """Panel dQ + dBias, grid (G, H, Nq, B//G) — the member index j is the
    INNERMOST (sequential) grid dim, so the dbias output panel (indexed by
    (g, h, i) only) is revisited on consecutive steps and accumulates the
    group's dS sum; dq is per-batch (b = g + j*G) and written once.  K/V are
    resident [N, D] panels, the k sweep an in-kernel fori_loop."""
    j = pl.program_id(3)
    q = q_ref[0, 0] * scale
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0].T  # [1, bq] lane-major in HBM -> [bq, 1]
    drow = drow_ref[0, 0].T
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


def _bwd_dkv_kernel_panel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, drow_ref,
    dk_ref, dv_ref, *, scale, block_q, n_q,
):
    """Panel dK + dV, grid (B, H, Nk): the k/v block is resident while
    q/dO/lse/drow stream through an in-kernel fori_loop."""
    k_blk = k_ref[0, 0]  # [bk, D]
    v_blk = v_ref[0, 0]
    D = k_blk.shape[-1]
    bk = k_blk.shape[0]

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[0, 0, pl.ds(i * block_q, block_q), :] * scale
        do_blk = do_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(
            jnp.float32
        )
        lse_blk = lse_ref[0, 0, :, pl.ds(i * block_q, block_q)].T  # [bq, 1]
        drow_blk = drow_ref[0, 0, :, pl.ds(i * block_q, block_q)].T
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


def _flash_bwd_panel(block_q, block_k, interpret, res, do, drow):
    """Resident-panel backward passes (see `_panel_blocks`)."""
    q, k, v, bias, out, lse = res
    B, H, N, D = q.shape
    scale = D**-0.5

    bias_was_3d = bias.ndim == 3
    bias4 = bias[None] if bias_was_3d else bias
    G = bias4.shape[0]

    # --- dQ + dBias -----------------------------------------------------
    grid1 = (G, H, N // block_q, B // G)
    k1 = functools.partial(
        _bwd_dq_dbias_kernel_panel, scale=scale, block_k=block_k,
        n_kv=N // block_k, n_member=B // G,
    )
    b_idx = lambda gi, h, i, j: (gi + j * G, h, i, 0)
    bn_idx = lambda gi, h, i, j: (gi + j * G, h, 0, 0)
    s_idx = lambda gi, h, i, j: (gi + j * G, h, 0, i)  # lane-major stats
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
            pl.BlockSpec(
                (1, 1, block_q, N), lambda gi, h, i, j: (gi, h, i, 0)
            ),
            pl.BlockSpec((1, 1, block_q, D), b_idx),   # dO
            pl.BlockSpec((1, 1, 1, block_q), s_idx),   # lse
            pl.BlockSpec((1, 1, 1, block_q), s_idx),   # drow
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), b_idx),
            pl.BlockSpec(
                (1, 1, block_q, N), lambda gi, h, i, j: (gi, h, i, 0)
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, bias4, do, lse, drow)

    # --- dK + dV ---------------------------------------------------------
    grid2 = (B, H, N // block_k)
    k2 = functools.partial(
        _bwd_dkv_kernel_panel, scale=scale, block_q=block_q,
        n_q=N // block_q,
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
                (1, 1, N, block_k),
                lambda b, h, i: (jax.lax.rem(b, G), h, 0, i),
            ),
            pl.BlockSpec((1, 1, N, D), full),          # dO
            pl.BlockSpec((1, 1, 1, N), lambda b, h, i: (b, h, 0, 0)),  # lse
            pl.BlockSpec((1, 1, 1, N), lambda b, h, i: (b, h, 0, 0)),  # drow
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, D), blk),
            pl.BlockSpec((1, 1, block_k, D), blk),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, bias4, do, lse, drow)

    dbias = dbias.astype(bias.dtype)
    if bias_was_3d:
        dbias = dbias[0]
    return dq, dk, dv, dbias


def _dq_ds_blocks(q, k_blk, v_blk, b_blk, do, lse, drow, j, block_k,
                  n_valid, k_tail):
    """Shared dS-block math for the dQ/dBias kernels: returns (ds, k_blk)
    with the tail's phantom key columns fully neutralized."""
    s = (
        jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_blk
    )
    if k_tail:
        bq = q.shape[0]
        s = jnp.where(_col_mask(j, block_k, n_valid, bq), s, NEG_INF)
        krow = jax.lax.broadcasted_iota(
            jnp.int32, v_blk.shape, 0
        ) + j * block_k
        v_blk = jnp.where(krow < n_valid, v_blk, 0.0)
        k_blk = jnp.where(krow < n_valid, k_blk, 0.0)
    p = jnp.exp(s - lse)  # [bq, bk]; phantom cols -> exp(-inf) = 0
    dp = jax.lax.dot_general(
        do, v_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - drow)
    return ds, k_blk


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, drow_ref,
    dq_ref, dbias_ref, dq_acc, *, scale, block_k, n_kv, n_valid, k_tail,
    emit_dbias,
):
    """dQ (+ dBias when every batch row owns its own bias group, G == B),
    grid (B, H, Nq_blocks, Nk_blocks) with k innermost: dq accumulates in
    VMEM scratch across the k sweep; each visited (i, j) tile of dS is the
    dbias block and is written exactly once."""
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0, 0] * scale
    do = do_ref[0, 0].astype(jnp.float32)
    ds, k_blk = _dq_ds_blocks(
        q, k_ref[0, 0], v_ref[0, 0], bias_ref[0, 0], do,
        lse_ref[0, 0].T, drow_ref[0, 0].T, j, block_k, n_valid, k_tail,
    )
    if emit_dbias:
        dbias_ref[0, 0] = ds
    dq_acc[...] = dq_acc[...] + jax.lax.dot_general(
        ds, k_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_kv - 1)
    def _flush():
        dq_ref[0, 0] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _bwd_dbias_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, drow_ref,
    dbias_ref, *, scale, block_k, n_valid, k_tail, n_member,
):
    """dBias for grouped bias (G < B), grid (G, H, Nq, Nk, B//G) with the
    member index m INNERMOST: the dbias block (g, h, i, j) is revisited on
    consecutive steps and accumulates the group's dS sum in-place."""
    j = pl.program_id(3)
    m = pl.program_id(4)
    q = q_ref[0, 0] * scale
    do = do_ref[0, 0].astype(jnp.float32)
    ds, _ = _dq_ds_blocks(
        q, k_ref[0, 0], v_ref[0, 0], bias_ref[0, 0], do,
        lse_ref[0, 0].T, drow_ref[0, 0].T, j, block_k, n_valid, k_tail,
    )

    @pl.when(m == 0)
    def _first():
        dbias_ref[0, 0] = ds

    @pl.when(m > 0)
    def _accum():
        dbias_ref[0, 0] = dbias_ref[0, 0] + ds


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, drow_ref,
    dk_ref, dv_ref, dk_acc, dv_acc, *, scale, block_q, n_q, n_valid, q_tail,
):
    """dK + dV, grid (B, H, Nk_blocks, Nq_blocks) with q innermost: the k/v
    tile's gradients accumulate in VMEM scratch while q/dO/lse stream by as
    grid blocks.  The q tail's phantom rows are zeroed (they would otherwise
    contribute garbage to the in-bounds dk/dv sums); phantom K-tile rows
    need no masking — their garbage lands in output rows the boundary
    store discards."""
    i = pl.program_id(3)

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k_blk = k_ref[0, 0]  # [bk, D]
    v_blk = v_ref[0, 0]
    q_blk = q_ref[0, 0] * scale
    do_blk = do_ref[0, 0].astype(jnp.float32)
    lse_blk = lse_ref[0, 0].T  # [1, bq] lane-major -> [bq, 1]
    drow_blk = drow_ref[0, 0].T
    if q_tail:
        qrow = jax.lax.broadcasted_iota(
            jnp.int32, q_blk.shape, 0
        ) + i * block_q
        rmask = qrow < n_valid
        q_blk = jnp.where(rmask, q_blk, 0.0)
        do_blk = jnp.where(rmask, do_blk, 0.0)
    s = (
        jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias_ref[0, 0]
    )
    p = jnp.exp(s - lse_blk)  # [bq, bk]
    dp = jax.lax.dot_general(
        do_blk, v_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - drow_blk)
    if q_tail:
        rmask1 = (
            jax.lax.broadcasted_iota(jnp.int32, p.shape, 0) + i * block_q
            < n_valid
        )
        p = jnp.where(rmask1, p, 0.0)
        ds = jnp.where(rmask1, ds, 0.0)
    dv_acc[...] = dv_acc[...] + jax.lax.dot_general(
        p, do_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_acc[...] = dk_acc[...] + jax.lax.dot_general(
        ds, q_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_q - 1)
    def _flush():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)  # q carried `scale`
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_impl(block_q, block_k, interpret, res, do, g_lse=None):
    """Fused flash backward: streaming Pallas passes (dQ [+dBias], dK+dV,
    and a dBias member-sum pass for grouped bias) — the [N, N] score matrix
    never touches HBM in the backward either, and no operand is padded.

    `g_lse` is the optional cotangent of the log-sum-exp output: since
    d(lse_i)/d(s_ij) = p_ij, it folds into the same kernels as
    ds = p * (dp - (drow - g_lse)) — one subtraction, no new kernel."""
    q, k, v, bias, out, lse = res
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    B, H, N, D = q.shape
    scale = D**-0.5

    drow = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, :, None, :]  # [B, H, 1, N] lane-major like lse (a trailing
    # singleton dim would tile-pad 128x in HBM)
    if g_lse is not None:
        drow = drow - g_lse.astype(jnp.float32)

    panel = _panel_blocks(N, D)
    if panel is not None:
        return _flash_bwd_panel(
            min(panel[0], N), min(panel[1], N), interpret, res, do, drow
        )

    block_q = _pick_block(min(block_q, N))
    block_k = _pick_block(min(block_k, N))
    nq, nk = _cdiv(N, block_q), _cdiv(N, block_k)
    q_tail, k_tail = N % block_q != 0, N % block_k != 0

    bias_was_3d = bias.ndim == 3
    bias4 = bias[None] if bias_was_3d else bias
    G = bias4.shape[0]

    qd = lambda b, h, i, j: (b, h, i, 0)    # q/dO blocks (row i)
    qs = lambda b, h, i, j: (b, h, 0, i)    # lane-major stats
    kd = lambda b, h, i, j: (b, h, j, 0)    # k/v blocks (col j)
    bd = lambda b, h, i, j: (jax.lax.rem(b, G), h, i, j)

    # --- dQ (+ dBias when G == B) --------------------------------------
    k1 = functools.partial(
        _bwd_dq_kernel, scale=scale, block_k=block_k, n_kv=nk,
        n_valid=N, k_tail=k_tail, emit_dbias=G == B,
    )
    dq, dbias = pl.pallas_call(
        k1,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            jax.ShapeDtypeStruct(
                (G, H, N, N) if G == B else (1, 1, 1, 1), jnp.float32
            ),
        ),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), qd),       # q
            pl.BlockSpec((1, 1, block_k, D), kd),       # k
            pl.BlockSpec((1, 1, block_k, D), kd),       # v
            pl.BlockSpec((1, 1, block_q, block_k), bd),  # bias
            pl.BlockSpec((1, 1, block_q, D), qd),       # dO
            pl.BlockSpec((1, 1, 1, block_q), qs),       # lse
            pl.BlockSpec((1, 1, 1, block_q), qs),       # drow
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), qd),
            pl.BlockSpec((1, 1, block_q, block_k), bd)
            if G == B
            else pl.BlockSpec((1, 1, 1, 1), lambda b, h, i, j: (0, 0, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, bias4, do, lse, drow)

    # --- dBias for grouped bias (G < B): sum dS over the group's batch
    # members via consecutive-revisit accumulation (member index innermost).
    if G != B:
        k3 = functools.partial(
            _bwd_dbias_kernel, scale=scale, block_k=block_k,
            n_valid=N, k_tail=k_tail, n_member=B // G,
        )
        mqd = lambda gi, h, i, j, m: (gi + m * G, h, i, 0)
        mqs = lambda gi, h, i, j, m: (gi + m * G, h, 0, i)
        mkd = lambda gi, h, i, j, m: (gi + m * G, h, j, 0)
        gbd = lambda gi, h, i, j, m: (gi, h, i, j)
        dbias = pl.pallas_call(
            k3,
            out_shape=jax.ShapeDtypeStruct((G, H, N, N), jnp.float32),
            grid=(G, H, nq, nk, B // G),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), mqd),       # q
                pl.BlockSpec((1, 1, block_k, D), mkd),       # k
                pl.BlockSpec((1, 1, block_k, D), mkd),       # v
                pl.BlockSpec((1, 1, block_q, block_k), gbd),  # bias
                pl.BlockSpec((1, 1, block_q, D), mqd),       # dO
                pl.BlockSpec((1, 1, 1, block_q), mqs),       # lse
                pl.BlockSpec((1, 1, 1, block_q), mqs),       # drow
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, block_k), gbd),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(q, k, v, bias4, do, lse, drow)

    # --- dK + dV ------------------------------------------------------
    k2 = functools.partial(
        _bwd_dkv_kernel, scale=scale, block_q=block_q, n_q=nq,
        n_valid=N, q_tail=q_tail,
    )
    kvq = lambda b, h, j, i: (b, h, i, 0)   # q/dO (row i, inner)
    kvs = lambda b, h, j, i: (b, h, 0, i)   # lane-major stats
    kvk = lambda b, h, j, i: (b, h, j, 0)   # k/v/dk/dv (col j, outer)
    kvb = lambda b, h, j, i: (jax.lax.rem(b, G), h, i, j)
    dk, dv = pl.pallas_call(
        k2,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, N, D), v.dtype),
        ),
        grid=(B, H, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), kvq),       # q
            pl.BlockSpec((1, 1, block_k, D), kvk),       # k
            pl.BlockSpec((1, 1, block_k, D), kvk),       # v
            pl.BlockSpec((1, 1, block_q, block_k), kvb),  # bias
            pl.BlockSpec((1, 1, block_q, D), kvq),       # dO
            pl.BlockSpec((1, 1, 1, block_q), kvs),       # lse
            pl.BlockSpec((1, 1, 1, block_q), kvs),       # drow
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, D), kvk),
            pl.BlockSpec((1, 1, block_k, D), kvk),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, bias4, do, lse, drow)

    dbias = dbias.astype(bias.dtype)
    if bias_was_3d:
        dbias = dbias[0]
    return dq, dk, dv, dbias


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
    return _flash_bwd_impl(block_q, block_k, interpret, res, g)


_flash_diff.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_lse_diff(q, k, v, bias, block_q, block_k, interpret):
    return _flash_impl(
        q, k, v, bias, block_q=block_q, block_k=block_k, interpret=interpret
    )


def _flash_lse_fwd(q, k, v, bias, block_q, block_k, interpret):
    out, lse = _flash_impl(
        q, k, v, bias, block_q=block_q, block_k=block_k, interpret=interpret
    )
    return (out, lse), (q, k, v, bias, out, lse)


def _flash_lse_bwd(block_q, block_k, interpret, res, g):
    g_out, g_lse = g
    return _flash_bwd_impl(block_q, block_k, interpret, res, g_out, g_lse)


_flash_lse_diff.defvjp(_flash_lse_fwd, _flash_lse_bwd)


def flash_window_attention_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """`flash_window_attention` that also returns the per-row log-sum-exp
    [B, H, 1, N] (lane-major) — DIFFERENTIABLY (dlse/ds = softmax folds into the same
    backward kernels).  This is the partial-softmax primitive ring/context-
    parallel attention needs: two chunks' (out, lse) merge exactly as

        lse = logaddexp(lse1, lse2)
        out = out1 * exp(lse1 - lse) + out2 * exp(lse2 - lse)

    and the merge is plain differentiable jnp (`parallel/ring_attention.py`).
    """
    return _flash_lse_diff(q, k, v, bias, block_q, block_k, interpret)


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
    nLon, mW = mask_t.shape[0], mask_t.shape[1]
    if mW not in (1, nW):
        raise ValueError(f"mask window axis {mW} must be 1 or match "
                         f"bias nW={nW}")
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
            # a size-1 mask axis (the default all-zero mask, or a mask
            # shared across window types) must index 0, not w (OOB)
            pl.BlockSpec(
                (1, 1, N, N),
                lambda i: (
                    jax.lax.rem(jax.lax.div(i, nW), nLon),
                    jax.lax.rem(i, nW) if mW == nW else 0, 0, 0,
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
    nLon, mW = mask_t.shape[0], mask_t.shape[1]
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
            # size-1 mask axes index 0 (default mask / shared mask)
            pl.BlockSpec(
                (1, 1, N, N),
                lambda w, h, j: (jax.lax.rem(j, nLon),
                                 w if mW == nW else 0, 0, 0),
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
        # constant mask: zero cotangent with the PRIMAL's shape (its own
        # leading dims — the default mask is (1, 1, N, N), not (nLon, nW))
        jnp.zeros(
            mask_t.shape[:2] + mask_t.shape[2:][::-1], dtype=mask_t.dtype
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

    Differentiable: a custom VJP runs fused streaming backward kernels
    (the [N, N] scores never touch HBM in either direction).

    Any N is supported natively: K/V/bias stream through the grid as
    `cdiv` blocks and the tail block's phantom keys are neutralized with
    iota masks inside the kernels — no operand is ever padded on the host
    (at the 2.0-degree 90x180 global window, N = 16200, padding the bias
    alone would cost two extra ~3.2 GB HBM tensors).
    """
    return _flash_diff(q, k, v, bias, block_q, block_k, interpret)


# ---------------------------------------------------------------------------
# Token-major packed window attention (zero host-side relayout)
# ---------------------------------------------------------------------------
#
# The transposed-layout packed kernel above is fast *inside* the kernel but
# expensive *around* it: producing its [BW, nh, D, N] operands from the qkv
# Dense output [B_, nW, N, 3C] costs a 6-axis transpose per layer (and its
# inverse on the output and every gradient), which XLA lowers to tens of
# thousands of small `copy` ops inside the rollout scan — measured 1.2 s of
# a 3.6 s Pangu batch-32 train step, with another ~0.45 s of backward grid
# overhead from its one-(window, head, sample)-per-program grid
# (results/traces/pangu_b32).
#
# This kernel instead consumes the Dense output layout DIRECTLY:
#
#   qkv  [B, L, nW, N, 3C]   (a free reshape of the Dense output; L = lon
#                             groups for Pangu's shift masks, else 1)
#   bias [nW, nh, Nk, Nq]    key-major (the in-kernel score orientation)
#   mask [L, nW|1, N, N]     additive shift mask (symmetric), or None
#
# Each program bulk-transposes its members' [N, 3C] blocks into head-major
# VMEM scratch once, then runs every head in the proven [D, N] MXU forms;
# the backward emits a FUSED dqkv [..., N, 3C] that feeds the Dense
# backward with no concatenation.  One program covers all heads of G batch
# members of one (window, lon) cell, so the grid shrinks by nh*G and the
# dBias accumulator is revisited consecutively across (lon, batch) for
# each window type.  No operand is transposed, padded, or re-laid-out on
# the host in either direction: HBM traffic is the tensors themselves.
#
# Replaces the EarthAttention3D packed path (models/pangu.py; reference
# `panguweather.py:133-211`); the transposed-layout kernel above remains
# for Swin HPX / win8 (`models/swin.py`).


def _tm_heads_fwd(xt_ref, ot_ref, bias_ref, m, lse_write, *, scale, nh, hd):
    """All heads of one member from head-major scratch: the proven [D, N]
    MXU forms (contracting the 16/32-deep head dim as sublanes — a
    lane-dim contraction per head would force a Mosaic relayout per
    (member, head) slice, measured 2.4x slower).  Shared by the token-major
    and the 5D (partition-free) kernels so the two paths are the same
    math by construction."""
    C = nh * hd
    for h in range(nh):
        sl = slice(h * hd, (h + 1) * hd)
        q = xt_ref[sl, :] * scale              # [hd, Nq]
        k = xt_ref[C + h * hd:C + (h + 1) * hd, :]
        v = xt_ref[2 * C + h * hd:2 * C + (h + 1) * hd, :]
        s = (
            jax.lax.dot_general(               # [Nk, Nq]
                k, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias_ref[0, h]
            + m
        )
        mx = jnp.max(s, axis=0, keepdims=True)  # [1, Nq]
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=0, keepdims=True)
        o = jax.lax.dot_general(               # [hd, Nq]
            v, p.astype(v.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,  # f32 accumulate
        )
        ot_ref[sl, :] = o / l
        lse_write(h, mx + jnp.log(l))


def _tm_attn_kernel(qkv_ref, bias_ref, mask_ref, o_ref, lse_ref,
                    xt_ref, ot_ref, *, scale, nh, hd, G):
    """Per (window, lon, batch-block) program: ONE bulk VMEM transpose of
    each member's [N, 3C] block into head-major scratch, then the head
    loop (`_tm_heads_fwd`).  `bias` and `mask` arrive KEY-MAJOR [Nk, Nq]
    (the shift mask is symmetric, see `window_attention_qkv`)."""
    m = mask_ref[0, 0]  # [Nk, Nq]
    for g in range(G):
        xt_ref[:] = qkv_ref[g, 0, 0].T  # [3C, N]

        def wl(h, row, g=g):
            lse_ref[g, 0, 0, h:h + 1, :] = row

        _tm_heads_fwd(xt_ref, ot_ref, bias_ref, m, wl,
                      scale=scale, nh=nh, hd=hd)
        o_ref[g, 0, 0] = ot_ref[:].T.astype(o_ref.dtype)


def _tm_heads_bwd(xt_ref, got_ref, dot_ref, dxt_ref, bias_ref, m, lse_row,
                  dbias_ref, *, scale, nh, hd):
    """Backward head loop from head-major scratch (shared by the
    token-major and the 5D kernels): recomputes scores, emits fused
    dq/dk/dv into `dxt_ref` and accumulates dBias."""
    C = nh * hd
    for h in range(nh):
        sl = slice(h * hd, (h + 1) * hd)
        q = xt_ref[sl, :] * scale                    # [hd, Nq]
        k = xt_ref[C + h * hd:C + (h + 1) * hd, :]
        v = xt_ref[2 * C + h * hd:2 * C + (h + 1) * hd, :]
        ot = got_ref[sl, :]
        dot = dot_ref[sl, :]
        s = (
            jax.lax.dot_general(                     # [Nk, Nq]
                k, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias_ref[0, h]
            + m
        )
        p = jnp.exp(s - lse_row(h))                  # [Nk, Nq]
        drow = jnp.sum(dot * ot, axis=0, keepdims=True)  # [1, Nq]
        dp = jax.lax.dot_general(                    # [Nk, Nq]
            v, dot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - drow)
        dbias_ref[0, h] = dbias_ref[0, h] + ds
        dxt_ref[sl, :] = scale * jax.lax.dot_general(
            k, ds, (((1,), (0,)), ((), ())),         # dq [hd, Nq]
            preferred_element_type=jnp.float32,
        )
        # `q` already carries `scale`, so no extra factor here
        dxt_ref[C + h * hd:C + (h + 1) * hd, :] = (
            jax.lax.dot_general(                     # dk [hd, Nk]
                q, ds, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        dxt_ref[2 * C + h * hd:2 * C + (h + 1) * hd, :] = (
            jax.lax.dot_general(                     # dv [hd, Nk]
                dot, p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )


def _tm_bwd_kernel(qkv_ref, bias_ref, mask_ref, o_ref, do_ref, lse_ref,
                   dqkv_ref, dbias_ref, xt_ref, got_ref, dot_ref, dxt_ref,
                   *, scale, nh, hd, G, shared_bias=False):
    """Same scratch-transpose scheme as the forward; emits the FUSED dqkv
    (one [N, 3C] store per member) and accumulates dBias across the
    (lon, batch) grid revisits of each window type (ALL windows when the
    bias is shared — `shared_bias`, leading dim 1)."""
    C = nh * hd
    w = pl.program_id(0)
    lon = pl.program_id(1)
    jb = pl.program_id(2)
    m = mask_ref[0, 0]  # [Nk, Nq]

    first = (lon == 0) & (jb == 0)
    if shared_bias:
        first = first & (w == 0)

    @pl.when(first)
    def _init():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    for g in range(G):
        xt_ref[:] = qkv_ref[g, 0, 0].T.astype(jnp.float32)  # [3C, N]
        got_ref[:] = o_ref[g, 0, 0].T.astype(jnp.float32)   # [C, N]
        dot_ref[:] = do_ref[g, 0, 0].T.astype(jnp.float32)  # [C, N]

        def lr(h, g=g):
            return lse_ref[g, 0, 0, h:h + 1, :]

        _tm_heads_bwd(xt_ref, got_ref, dot_ref, dxt_ref, bias_ref, m, lr,
                      dbias_ref, scale=scale, nh=nh, hd=hd)
        dqkv_ref[g, 0, 0] = dxt_ref[:].T.astype(dqkv_ref.dtype)


def _tm_group(B, L, nW, nh, N, C, cap=8, bwd=True):
    """Largest divisor of B <= cap whose VMEM plan stays under the 16 MB
    scoped limit.  The backward is the bigger of the two (qkv and dqkv
    blocks with double buffering, o/do blocks, bias + dbias resident,
    the four [*, N] scratches, [N, N] transients); the forward carries
    roughly half of that, so it can afford a larger G (fewer programs)."""
    def pad(c):  # lane padding of the minor dim in VMEM
        return -(-c // 128) * 128

    # Coefficients calibrated against the relay compiler's scoped-vmem
    # verdicts at N=144 (pass: C=96 G=8 / C=192 G=2; fail: C=192 G=4):
    # double-buffered [G, N, 3C]+[G, N, C] block pairs, bias+dbias
    # resident, ~3 MB of scratch/transients.  The forward halves the
    # per-member and bias terms (no dqkv/do blocks, no dbias).
    def est(cand):
        per_g = cand * N * (pad(3 * C) + pad(C)) * 16
        fixed = nh * N * N * 32
        if not bwd:
            per_g //= 2
            fixed //= 2
        return per_g + fixed + 3e6

    g = 1
    for cand in range(2, cap + 1):
        if B % cand == 0 and est(cand) < 17e6:
            g = cand
    return g


@functools.partial(jax.jit, static_argnames=("nh", "interpret"))
def _tm_impl(qkv, bias, mask, nh, interpret=False):
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    B, L, nW, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // nh
    mL, mW = mask.shape[0], mask.shape[1]
    bW = bias.shape[0]  # 1 = shared bias (e.g. unshifted Swin windows)
    G = _tm_group(B, L, nW, nh, N, C, bwd=False)
    scale = hd**-0.5
    kernel = functools.partial(_tm_attn_kernel, scale=scale, nh=nh, hd=hd,
                               G=G)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, L, nW, N, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, L, nW, nh, N), jnp.float32),
        ),
        grid=(nW, L, B // G),
        in_specs=[
            pl.BlockSpec((G, 1, 1, N, C3),
                         lambda w, lon, jb: (jb, lon, w, 0, 0)),
            pl.BlockSpec((1, nh, N, N),
                         lambda w, lon, jb: (w if bW > 1 else 0, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, N, N),
                lambda w, lon, jb: (lon if mL > 1 else 0,
                                    w if mW > 1 else 0, 0, 0),
            ),
        ],
        out_specs=(
            pl.BlockSpec((G, 1, 1, N, C),
                         lambda w, lon, jb: (jb, lon, w, 0, 0)),
            pl.BlockSpec((G, 1, 1, nh, N),
                         lambda w, lon, jb: (jb, lon, w, 0, 0)),
        ),
        scratch_shapes=[
            # qkv scratch keeps the input dtype: under bf16 compute the
            # score/output dots then run single-pass bf16 MXU
            pltpu.VMEM((C3, N), qkv.dtype),     # transposed qkv member
            pltpu.VMEM((C, N), jnp.float32),    # head-major output
        ],
        interpret=interpret,
    )(qkv, bias, mask)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _tm_diff(qkv, bias, mask, nh, interpret):
    out, _ = _tm_impl(qkv, bias, mask, nh, interpret=interpret)
    return out


def _tm_fwd(qkv, bias, mask, nh, interpret):
    out, lse = _tm_impl(qkv, bias, mask, nh, interpret=interpret)
    return out, (qkv, bias, mask, out, lse)


def _tm_bwd(nh, interpret, res, g):
    qkv, bias, mask, out, lse = res
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    B, L, nW, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // nh
    mL, mW = mask.shape[0], mask.shape[1]
    bW = bias.shape[0]
    G = _tm_group(B, L, nW, nh, N, C)
    scale = hd**-0.5
    kernel = functools.partial(_tm_bwd_kernel, scale=scale, nh=nh, hd=hd,
                               G=G, shared_bias=bW == 1)
    blk3 = lambda w, lon, jb: (jb, lon, w, 0, 0)
    dqkv, dbias = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, L, nW, N, C3), qkv.dtype),
            jax.ShapeDtypeStruct((bW, nh, N, N), jnp.float32),
        ),
        grid=(nW, L, B // G),  # (lon, jb) innermost: consecutive dbias
        in_specs=[             # revisits per window type
            pl.BlockSpec((G, 1, 1, N, C3), blk3),   # qkv
            pl.BlockSpec((1, nh, N, N),
                         lambda w, lon, jb: (w if bW > 1 else 0, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, N, N),
                lambda w, lon, jb: (lon if mL > 1 else 0,
                                    w if mW > 1 else 0, 0, 0),
            ),
            pl.BlockSpec((G, 1, 1, N, C), blk3),    # out
            pl.BlockSpec((G, 1, 1, N, C), blk3),    # dO
            pl.BlockSpec((G, 1, 1, nh, N), blk3),   # lse
        ],
        out_specs=(
            pl.BlockSpec((G, 1, 1, N, C3), blk3),
            pl.BlockSpec((1, nh, N, N),
                         lambda w, lon, jb: (w if bW > 1 else 0, 0, 0, 0)),
        ),
        scratch_shapes=[
            # f32 throughout the backward: ds/p/drow are f32, and Mosaic
            # dots require dtype-uniform operands
            pltpu.VMEM((C3, N), jnp.float32),   # transposed qkv member
            pltpu.VMEM((C, N), jnp.float32),    # transposed out
            pltpu.VMEM((C, N), jnp.float32),    # transposed dO
            pltpu.VMEM((C3, N), jnp.float32),   # head-major dqkv
        ],
        interpret=interpret,
    )(qkv, bias, mask, out, g, lse)
    return dqkv, dbias.astype(bias.dtype), jnp.zeros_like(mask)


_tm_diff.defvjp(_tm_fwd, _tm_bwd)


def window_attention_qkv(
    qkv: jax.Array,
    bias: jax.Array,
    mask: jax.Array | None,
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused small-window attention on the RAW fused-qkv layout.

    qkv:  [B, L, nW, N, 3C] — the qkv Dense output, reshaped (free) so L
          indexes the mask's lon groups (L = 1 when mask is None).
    bias: [nW, nh, N, N] KEY-major ([key, query]) per-window-type bias —
          the layout the in-kernel [Nk, Nq] score tiles consume directly
          (`expand_earth_bias` emits it; hoisted to `precompute` so no
          per-step transpose runs inside the rollout scan).
    mask: [L, nW, N, N] (or broadcastable 1-sized leading dims) additive
          shift mask, or None.  Must be SYMMETRIC in its trailing [N, N]
          (true of group-id shift masks, which Pangu/Swin build): the
          kernel applies it to [key, query]-oriented scores.

    Returns [B, L, nW, N, C].  Differentiable: the fused backward emits
    dqkv in the same layout (feeding the Dense VJP without concatenation)
    and the batch-summed dBias; the mask is constant (zero cotangent).
    """
    if mask is None:
        N = qkv.shape[-2]
        mask = jnp.zeros((1, 1, N, N), qkv.dtype)
    return _tm_diff(qkv, bias, mask, num_heads, interpret)


# ---------------------------------------------------------------------------
# 5D window attention: partition/reverse folded into the grid index maps
# ---------------------------------------------------------------------------
#
# `window_attention_qkv` removed the head-major relayouts, but the model
# still runs `window_partition_3d` / `window_reverse_3d` around it — an
# 8-axis transpose pair per block (plus its adjoints) that XLA schedules as
# fusions/copies inside the rollout scan (~0.2-0.3 s of the 1.32 s Pangu
# batch-32 step, results/attention_training_notes.md round 4).  A window
# (ipl, ilat, ilon) is a CONTIGUOUS block of the padded 5D field, so the
# partition is expressible as BlockSpec index maps: the qkv Dense runs on
# the un-partitioned [B, Pl, Lat, Lon, 3C] tokens (per-token, layout-
# independent) and each program reads its [G, wpl, wlat, wlon, 3C] window
# block straight from HBM.  In VMEM the member is first row-packed into an
# [N, 3C] scratch (sublane-slice stores, lane-dim untouched), then the
# SAME bulk transpose + head loop as the token-major kernel runs — the two
# paths share `_tm_heads_fwd`/`_tm_heads_bwd`, so they are the same math
# by construction.  The output (and dqkv) is written back as 5D window
# blocks: no partition, reverse, or relayout exists anywhere on the host.


def _tm5_attn_kernel(qkv_ref, bias_ref, mask_ref, o_ref, lse_ref,
                     xrow_ref, xt_ref, ot_ref, *, scale, nh, hd, G, win,
                     LG, mL):
    """`LG` lon-windows per program (Mosaic needs the second-minor block
    dim divisible by 8 — lone wlon=12 is not, LG*wlon is)."""
    wpl, wlat, wlon = win
    m_all = mask_ref[...]  # [mLG, 1, Nk, Nq]
    for g in range(G):
        for lw in range(LG):
            m = m_all[lw if mL > 1 else 0, 0]
            for r in range(wpl * wlat):
                xrow_ref[r * wlon:(r + 1) * wlon, :] = qkv_ref[
                    g, r // wlat, r % wlat,
                    lw * wlon:(lw + 1) * wlon, :
                ]
            xt_ref[:] = xrow_ref[:].T  # [3C, N]

            def wl(h, row, g=g, lw=lw):
                lse_ref[g, lw, 0, h:h + 1, :] = row

            _tm_heads_fwd(xt_ref, ot_ref, bias_ref, m, wl,
                          scale=scale, nh=nh, hd=hd)
            orow = ot_ref[:].T.astype(o_ref.dtype)  # [N, C]
            for r in range(wpl * wlat):
                o_ref[
                    g, r // wlat, r % wlat, lw * wlon:(lw + 1) * wlon, :
                ] = orow[r * wlon:(r + 1) * wlon, :]


def _tm5_bwd_kernel(qkv_ref, bias_ref, mask_ref, o_ref, do_ref, lse_ref,
                    dqkv_ref, dbias_ref, xrow_ref, xt_ref, got_ref, dot_ref,
                    dxt_ref, *, scale, nh, hd, G, win, LG, mL):
    wpl, wlat, wlon = win
    lon = pl.program_id(1)
    jb = pl.program_id(2)
    m_all = mask_ref[...]  # [mLG, 1, Nk, Nq]

    @pl.when((lon == 0) & (jb == 0))
    def _init():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    rows = wpl * wlat
    for g in range(G):
        for lw in range(LG):
            m = m_all[lw if mL > 1 else 0, 0]
            for r in range(rows):
                xrow_ref[r * wlon:(r + 1) * wlon, :] = qkv_ref[
                    g, r // wlat, r % wlat,
                    lw * wlon:(lw + 1) * wlon, :
                ].astype(jnp.float32)
            xt_ref[:] = xrow_ref[:].T                           # [3C, N]
            for r in range(rows):
                got_ref[:, r * wlon:(r + 1) * wlon] = o_ref[
                    g, r // wlat, r % wlat,
                    lw * wlon:(lw + 1) * wlon, :
                ].T.astype(jnp.float32)
                dot_ref[:, r * wlon:(r + 1) * wlon] = do_ref[
                    g, r // wlat, r % wlat,
                    lw * wlon:(lw + 1) * wlon, :
                ].T.astype(jnp.float32)

            def lr(h, g=g, lw=lw):
                return lse_ref[g, lw, 0, h:h + 1, :]

            _tm_heads_bwd(xt_ref, got_ref, dot_ref, dxt_ref, bias_ref, m,
                          lr, dbias_ref, scale=scale, nh=nh, hd=hd)
            drow_full = dxt_ref[:].T.astype(dqkv_ref.dtype)     # [N, 3C]
            for r in range(rows):
                dqkv_ref[
                    g, r // wlat, r % wlat, lw * wlon:(lw + 1) * wlon, :
                ] = drow_full[r * wlon:(r + 1) * wlon, :]


def _tm5_lon_group(nLon, wlon):
    """Smallest k dividing nLon with k*wlon a multiple of 8 (Mosaic's
    second-minor block constraint), falling back to full Lon (always
    legal: block dim == array dim)."""
    for k in range(1, nLon):
        if nLon % k == 0 and (k * wlon) % 8 == 0:
            return k
    return nLon


def _tm5_group(B, nh, N, C, LG, itemsize=4, cap=8, bwd=True):
    """VMEM-plan G estimator for the 5D kernel — `_tm_group` with the
    per-member block cost scaled by the LG lon-windows a program holds
    (the [N, N] transients stay per-window) and by the BLOCK dtype (the
    forward's qkv/out blocks ride the input dtype; chip-verified: fp32
    LG=2 G=8 hits the 16 MB scoped-vmem wall at 16.26M, G=4 fits;
    bf16 G=8 fits)."""
    def pad(c):
        return -(-c // 128) * 128

    def est(cand):
        # the 5D fwd's blocks ride the input dtype and are NOT halved vs
        # the bwd (out+lse blocks replace dqkv); only the resident
        # bias/transient share shrinks
        per_g = cand * LG * N * (pad(3 * C) + pad(C)) * 4 * itemsize
        fixed = nh * N * N * 32
        if not bwd:
            fixed //= 2
        return per_g + fixed + 3e6

    g = 1
    for cand in range(2, cap + 1):
        if B % cand == 0 and est(cand) < 17e6:
            g = cand
    return g


def _tm5_specs(nLat, LG):
    blk5 = lambda w, lon, jb: (jb, w // nLat, w % nLat, lon, 0)
    blk_lse = lambda w, lon, jb: (jb, lon, w, 0, 0)
    return blk5, blk_lse


@functools.partial(jax.jit, static_argnames=("nh", "win", "interpret"))
def _tm5_impl(qkv5, bias, mask, nh, win, interpret=False):
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    B, Pl, Lat, Lon, C3 = qkv5.shape
    wpl, wlat, wlon = win
    nPl, nLat, nLon = Pl // wpl, Lat // wlat, Lon // wlon
    nW, N = nPl * nLat, wpl * wlat * wlon
    C = C3 // 3
    hd = C // nh
    mL, mW = mask.shape[0], mask.shape[1]
    LG = _tm5_lon_group(nLon, wlon)
    G = _tm5_group(B, nh, N, C, LG, itemsize=qkv5.dtype.itemsize,
                   bwd=False)
    scale = hd**-0.5
    blk5, blk_lse = _tm5_specs(nLat, LG)
    kernel = functools.partial(_tm5_attn_kernel, scale=scale, nh=nh, hd=hd,
                               G=G, win=win, LG=LG, mL=mL)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, Pl, Lat, Lon, C), qkv5.dtype),
            jax.ShapeDtypeStruct((B, nLon, nW, nh, N), jnp.float32),
        ),
        grid=(nW, nLon // LG, B // G),
        in_specs=[
            pl.BlockSpec((G, wpl, wlat, LG * wlon, C3), blk5),
            pl.BlockSpec((1, nh, N, N), lambda w, lon, jb: (w, 0, 0, 0)),
            pl.BlockSpec(
                (LG if mL > 1 else 1, 1, N, N),
                lambda w, lon, jb: (lon if mL > 1 else 0,
                                    w if mW > 1 else 0, 0, 0),
            ),
        ],
        out_specs=(
            pl.BlockSpec((G, wpl, wlat, LG * wlon, C), blk5),
            pl.BlockSpec((G, LG, 1, nh, N), blk_lse),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, C3), qkv5.dtype),    # row-packed member
            pltpu.VMEM((C3, N), qkv5.dtype),    # transposed qkv member
            pltpu.VMEM((C, N), jnp.float32),    # head-major output
        ],
        interpret=interpret,
    )(qkv5, bias, mask)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _tm5_diff(qkv5, bias, mask, nh, win, interpret):
    out, _ = _tm5_impl(qkv5, bias, mask, nh, win, interpret=interpret)
    return out


def _tm5_fwd(qkv5, bias, mask, nh, win, interpret):
    out, lse = _tm5_impl(qkv5, bias, mask, nh, win, interpret=interpret)
    return out, (qkv5, bias, mask, out, lse)


def _tm5_bwd(nh, win, interpret, res, g):
    qkv5, bias, mask, out, lse = res
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    B, Pl, Lat, Lon, C3 = qkv5.shape
    wpl, wlat, wlon = win
    nPl, nLat, nLon = Pl // wpl, Lat // wlat, Lon // wlon
    nW, N = nPl * nLat, wpl * wlat * wlon
    C = C3 // 3
    hd = C // nh
    mL, mW = mask.shape[0], mask.shape[1]
    LG = _tm5_lon_group(nLon, wlon)
    G = _tm5_group(B, nh, N, C, LG, itemsize=qkv5.dtype.itemsize)
    scale = hd**-0.5
    blk5, blk_lse = _tm5_specs(nLat, LG)
    kernel = functools.partial(_tm5_bwd_kernel, scale=scale, nh=nh, hd=hd,
                               G=G, win=win, LG=LG, mL=mL)
    dqkv, dbias = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, Pl, Lat, Lon, C3), qkv5.dtype),
            jax.ShapeDtypeStruct((nW, nh, N, N), jnp.float32),
        ),
        # (lon, jb) innermost: consecutive dbias revisits per window type
        grid=(nW, nLon // LG, B // G),
        in_specs=[
            pl.BlockSpec((G, wpl, wlat, LG * wlon, C3), blk5),
            pl.BlockSpec((1, nh, N, N),
                         lambda w, lon, jb: (w, 0, 0, 0)),
            pl.BlockSpec(
                (LG if mL > 1 else 1, 1, N, N),
                lambda w, lon, jb: (lon if mL > 1 else 0,
                                    w if mW > 1 else 0, 0, 0),
            ),
            pl.BlockSpec((G, wpl, wlat, LG * wlon, C), blk5),   # out
            pl.BlockSpec((G, wpl, wlat, LG * wlon, C), blk5),   # dO
            pl.BlockSpec((G, LG, 1, nh, N), blk_lse),           # lse
        ],
        out_specs=(
            pl.BlockSpec((G, wpl, wlat, LG * wlon, C3), blk5),
            pl.BlockSpec((1, nh, N, N),
                         lambda w, lon, jb: (w, 0, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, C3), jnp.float32),   # row-packed member
            pltpu.VMEM((C3, N), jnp.float32),   # transposed qkv member
            pltpu.VMEM((C, N), jnp.float32),    # transposed out
            pltpu.VMEM((C, N), jnp.float32),    # transposed dO
            pltpu.VMEM((C3, N), jnp.float32),   # head-major dqkv
        ],
        interpret=interpret,
    )(qkv5, bias, mask, out, g, lse)
    return dqkv, dbias.astype(bias.dtype), jnp.zeros_like(mask)


_tm5_diff.defvjp(_tm5_fwd, _tm5_bwd)


def window_attention_qkv5d(
    qkv5: jax.Array,
    bias: jax.Array,
    mask: jax.Array | None,
    num_heads: int,
    window_size: tuple[int, int, int],
    interpret: bool = False,
) -> jax.Array:
    """Fused small-window attention DIRECTLY on the padded 5D field —
    `window_partition_3d`/`window_reverse_3d` become BlockSpec index maps.

    qkv5: [B, Pl, Lat, Lon, 3C] — the qkv Dense output on the padded
          (and, for shifted blocks, rolled) token field; every dim must be
          divisible by its window size.
    bias: [nW, nh, N, N] KEY-major per-window-type bias (nW = nPl*nLat).
    mask: [nLon, nW|1, N, N] additive shift mask (symmetric), or None.

    Returns [B, Pl, Lat, Lon, C].  Differentiable; dqkv comes back in the
    same 5D layout (feeding the Dense VJP directly), dBias batch-summed
    in-kernel, mask constant.
    """
    if mask is None:
        wpl, wlat, wlon = window_size
        N = wpl * wlat * wlon
        mask = jnp.zeros((1, 1, N, N), qkv5.dtype)
    return _tm5_diff(qkv5, bias, mask, num_heads, tuple(window_size),
                     interpret)
