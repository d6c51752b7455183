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


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, block_k, n_kv):
    # block shapes: q [1,1,block_q,D]; k/v [1,1,N,D]; bias [1,1,block_q,N]
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
    acc, _, l = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


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
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, N, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, N, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, block_q, N), lambda b, h, i: (jax.lax.rem(b, G), h, i, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
        interpret=interpret,
    )(q, k, v, bias)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_diff(q, k, v, bias, block_q, block_k, interpret):
    return _flash_impl(
        q, k, v, bias, block_q=block_q, block_k=block_k, interpret=interpret
    )


def _flash_fwd(q, k, v, bias, block_q, block_k, interpret):
    out = _flash_impl(
        q, k, v, bias, block_q=block_q, block_k=block_k, interpret=interpret
    )
    return out, (q, k, v, bias)


def _flash_bwd(block_q, block_k, interpret, res, g):
    """Backward: recompute attention with the einsum reference and let XLA
    differentiate it.  The forward stays memory-light (no [N, N] scores kept
    in HBM); the backward materializes scores like standard attention —
    correct adjoints at standard cost.  (A fused flash backward kernel is a
    future optimization.)"""
    q, k, v, bias = res
    D = q.shape[-1]
    scale = D**-0.5
    bias_ndim = bias.ndim

    def f(q, k, v, bias):
        b = bias if bias.ndim == 4 else bias[None]
        G = b.shape[0]
        B = q.shape[0]
        bb = jnp.tile(b, (B // G, 1, 1, 1))
        s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k) + bb
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)

    _, vjp = jax.vjp(f, q, k, v, bias)
    return vjp(g)


_flash_diff.defvjp(_flash_fwd, _flash_bwd)


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
    """
    return _flash_diff(q, k, v, bias, block_q, block_k, interpret)
