"""Ring (context-parallel) window attention over a device mesh.

The reference has no context parallelism (SURVEY §2.7: CP/ring absent) —
its global-window attention models (Swin `swin_transformer.py:561`
window = resolution; Pangu 3D windows) are single-device.  On TPU the
sequence axis is the natural scaling axis for those models: at 2.0 degrees
a global window is N = 16200 tokens and the per-head relative-position
bias alone is ~1 GB, so one chip runs out of HBM long before compute.

This module shards the window's token axis across a mesh axis and runs the
classic ring-attention schedule (Liu et al. 2023, "Ring Attention with
Blockwise Transformers"):

- every device holds a q-row chunk, a kv chunk, and the bias ROWS for its
  queries ([G, H, N/P, N] — the only O(N^2) operand, now /P per device);
- P steps: attend q_local x kv_chunk with the fused flash kernel
  (`ops/pallas_attention.py`), merge the partial softmax via log-sum-exp,
  then rotate kv around the ring with `ppermute` (ICI neighbor traffic,
  overlapped by XLA with the next chunk's compute).

The merge identity: chunks' partial (out_c, lse_c) combine exactly as
    lse = logaddexp(lse_1, lse_2)
    out = out_1 * exp(lse_1 - lse) + out_2 * exp(lse_2 - lse)
which is plain differentiable jnp — gradients flow through the chunk
kernels' custom VJP (`flash_window_attention_lse` exposes d(lse) at the
cost of one subtraction), the slice adjoint, and ppermute's inverse
rotation.  No hand-written backward needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlwpbench_tpu.ops.pallas_attention import flash_window_attention_lse

NEG_BIG = -1e30


def ring_window_attention(
    q_local: jax.Array,
    k_local: jax.Array,
    v_local: jax.Array,
    bias_local: jax.Array,
    axis_name: str,
    interpret: bool = False,
) -> jax.Array:
    """Inside `shard_map`: sequence-sharded ring attention.

    q/k/v_local: [B, H, N/P, D] — token rows of this shard.
    bias_local:  [G, H, N/P, N] — bias rows for this shard's queries, ALL
                 key columns (group selected as b % G, as in the kernel).
    Returns out_local [B, H, N/P, D].
    """
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    B, H, Nl, D = q_local.shape
    assert bias_local.shape[-1] == Nl * p, (bias_local.shape, Nl, p)

    out = jnp.zeros((B, H, Nl, D), jnp.float32)
    # kernel lse layout: [B, H, 1, N] lane-major (pallas_attention)
    lse = jnp.full((B, H, 1, Nl), NEG_BIG, jnp.float32)
    kc, vc = k_local, v_local
    ring = [(i, (i + 1) % p) for i in range(p)]

    for r in range(p):
        # Double buffering: ISSUE the rotation of the next kv chunk before
        # attending to the current one.  The permute reads only (kc, vc) —
        # never this round's attention output — so the collective-permute
        # start can ride the ICI while the flash kernel runs; issuing it
        # first makes that independence explicit in program order for
        # XLA's latency-hiding scheduler (audited structurally by
        # `scripts/schedule_audit.py`).
        if r < p - 1:  # last chunk needs no further rotation
            k_next = lax.ppermute(kc, axis_name, ring)
            v_next = lax.ppermute(vc, axis_name, ring)
        # the kv chunk now held originated at rank (idx - r) % p: select the
        # matching global bias columns for these keys
        src = lax.rem(idx - r + p, p)
        bcols = lax.dynamic_slice_in_dim(bias_local, src * Nl, Nl, axis=-1)
        o_c, lse_c = flash_window_attention_lse(
            q_local, kc, vc, bcols, interpret=interpret
        )
        lse_new = jnp.logaddexp(lse, lse_c)
        w_old = jnp.moveaxis(jnp.exp(lse - lse_new), -1, -2)  # [B,H,Nl,1]
        w_new = jnp.moveaxis(jnp.exp(lse_c - lse_new), -1, -2)
        out = out * w_old + o_c.astype(jnp.float32) * w_new
        lse = lse_new
        if r < p - 1:
            kc, vc = k_next, v_next
    return out.astype(q_local.dtype)


def ring_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mesh: Mesh,
    axis: str = "x",
    head_axis: str | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Global-array entry point: shards the token axis of q/k/v and the
    QUERY-row axis of bias over `axis`, runs the ring, and returns the
    full-sequence output with the same sharding as q.

    q, k, v: [B, H, N, D]; bias [H, N, N] or [G, H, N, N]; N % P == 0.

    `head_axis` adds the 2D (sequence x head) decomposition for >8-chip
    strong scaling (VERDICT r4 #6): attention is embarrassingly parallel
    over heads, so sharding H over a second mesh axis divides the ring's
    kv payload AND the per-chip compute by the head-axis size with no new
    collectives inside the ring — each head group runs its own ring over
    its `axis` subgroup.  (The surrounding projections become standard
    Megatron TP in the model; this function only owns the ring.)
    """
    if bias.ndim == 3:
        bias = bias[None]
    p = mesh.shape[axis]
    N = q.shape[2]
    assert N % p == 0, f"token count {N} must divide the '{axis}' axis ({p})"
    if head_axis is not None:
        ph = mesh.shape[head_axis]
        assert q.shape[1] % ph == 0, (
            f"head count {q.shape[1]} must divide the "
            f"'{head_axis}' axis ({ph})"
        )

    fn = functools.partial(
        ring_window_attention, axis_name=axis, interpret=interpret
    )
    seq = P(None, head_axis, axis, None)
    out = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(seq, seq, seq, P(None, head_axis, axis, None)),
        out_specs=seq,
        check_vma=False,
    )(q, k, v, bias)
    return out


def shard_ring_operands(q, k, v, bias, mesh, axis="x"):
    """Device-put the ring operands with their ring shardings (helper for
    benchmarks/drivers; `ring_attention_sharded` works on any layout but
    pre-sharding avoids a resharding pass on the first call)."""
    seq = NamedSharding(mesh, P(None, None, axis, None))
    if bias.ndim == 3:
        bias = bias[None]
    return (
        jax.device_put(q, seq),
        jax.device_put(k, seq),
        jax.device_put(v, seq),
        jax.device_put(bias, NamedSharding(mesh, P(None, None, axis, None))),
    )
