"""Shared model calling convention + autoregressive rollout as `lax.scan`.

Every model in the zoo implements the reference's contract
(`unet.py:143-203`, `convlstm.py:232-251`, `fno.py:78-106`, ...):

    forward(constants [B,1,Cc,(F),H,W],
            prescribed [B,T,Cp,(F),H,W],
            prognostic [B,T,Cq,(F),H,W]) -> [B, T-context, Cq, (F), H, W]

with an autoregressive loop inside forward: teacher-forced ground truth for
t < context_size, then closed-loop on its own outputs, always predicting the
residual `out = prognostic_t[:, -1] + net(x_t)` (reference `unet.py:196`).
Per-step input assembly concatenates constants + the context window of
prescribed and prognostic states, time-major flattened onto channels
(`unet.py:156-169`: `rearrange "b t c h w -> b (t c) h w"`).

The reference materializes this as a Python loop appending tensors; here the
loop is a single `nn.scan` (XLA `lax.scan`), so the whole N-step rollout
traces once, the step network compiles once, and the carry — a ring buffer of
the last `context_size` prognostic states (+ optional model state, e.g.
ConvLSTM h/c) — lives on-device in registers/HBM with no host sync.

Internally everything is channels-last ([B,(F),H,W,C]) for TPU-efficient NHWC
convs; the channel-first reference data contract is transposed at entry/exit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _to_channels_last(x: jax.Array) -> jax.Array:
    """[B, T, C, (F), H, W] -> [B, T, (F), H, W, C]."""
    return jnp.moveaxis(x, 2, -1)


def _to_channels_first(x: jax.Array) -> jax.Array:
    """[B, T, (F), H, W, C] -> [B, T, C, (F), H, W]."""
    return jnp.moveaxis(x, -1, 2)


def _flatten_window(win: jax.Array) -> jax.Array:
    """[B, ctx, (F), H, W, C] -> [B, (F), H, W, ctx*C] (time-major channels).

    Matches the reference channel ordering `b t c ... -> b (t c) ...`.
    """
    b = win.shape[0]
    ctx = win.shape[1]
    spatial = win.shape[2:-1]
    c = win.shape[-1]
    win = jnp.moveaxis(win, 1, -2)  # [B, (F), H, W, ctx, C]
    return win.reshape(b, *spatial, ctx * c)


def wrap_remat(body, remat: bool, remat_policy: str = "full"):
    """Wrap a flax scan body in per-step rematerialization.

    Shared by `RolloutModel` and the models with bespoke scan semantics
    (ConvLSTM scans from t=0 with persistent h/c; DISTANA carries lateral
    lattice state) so every family honors `clone(remat=True)` the same way.
    """
    if not remat:
        return body
    policies = {
        "full": None,
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }
    if remat_policy not in policies:
        raise ValueError(
            f"unknown remat_policy {remat_policy!r}; "
            f"expected one of {sorted(policies)}"
        )
    return nn.remat(body, prevent_cse=False, policy=policies[remat_policy])


class RolloutModel(nn.Module):
    """Base class: subclasses implement `step` (and optionally `init_state`).

    `step(x, state)` maps the assembled input [B, (F), H, W, Cin] to the
    prognostic increment [B, (F), H, W, Cq] plus the next model state (None
    for stateless nets).

    `remat=True` rematerializes each rollout step in the backward pass
    (`jax.checkpoint` per scan iteration — the TPU analog of the reference's
    `torch.utils.checkpoint` segment checkpointing, SURVEY 2.7): activation
    memory for an N-step rollout drops from O(N * net) to O(net).

    `remat_policy` refines the FLOPs/HBM trade within each checkpointed
    step: "full" saves nothing (max memory savings, recompute everything);
    "dots" keeps MXU matmul/conv outputs resident and recomputes only the
    cheap VPU elementwise chains; "dots_no_batch" additionally drops
    batched matmul outputs.
    """

    remat: bool = False
    remat_policy: str = "full"

    # Subclasses are dataclasses; these fields are re-declared there.
    def step(self, x: jax.Array, state: Any) -> tuple[jax.Array, Any]:
        raise NotImplementedError

    def init_state(self, x_shape: tuple[int, ...]) -> Any:
        """Optional recurrent state (e.g. ConvLSTM h/c), reset per sequence."""
        return None

    def precompute(self) -> Any:
        """Per-rollout constants computed ONCE outside the scan.

        `lax.scan` does not hoist loop-invariant work whose results are
        large (XLA's LICM declines on memory growth), so anything derived
        from params alone — e.g. Swin/Pangu attention biases expanded from
        their position tables — must be hoisted manually or it is recomputed
        every rollout step.  Implementations may only READ params declared in
        `setup()` (this runs outside the compact context); the result is
        closed over by the scan body and becomes a scan constant.  Return
        None (default) for models with nothing to hoist; otherwise `step`
        receives it as a third argument.
        """
        return None

    def __call__(
        self,
        constants: Optional[jax.Array] = None,
        prescribed: Optional[jax.Array] = None,
        prognostic: jax.Array = None,
    ) -> jax.Array:
        ctx = self.context_size
        assert prognostic is not None, "prognostic input is required"
        T = prognostic.shape[1]
        steps = T - ctx
        assert steps >= 1, f"sequence length {T} must exceed context {ctx}"

        prog = _to_channels_last(prognostic)
        const = _to_channels_last(constants)[:, 0] if constants is not None else None
        pres = _to_channels_last(prescribed) if prescribed is not None else None

        # Stack prescribed context windows for the scan: [steps, B, ctx, ...].
        if pres is not None:
            xs = jax.vmap(
                lambda i: jax.lax.dynamic_slice_in_dim(pres, i, ctx, axis=1)
            )(jnp.arange(steps))
        else:
            xs = jnp.zeros((steps, 0))

        window0 = prog[:, :ctx]
        state0 = self.init_state(window0[:, 0].shape)
        aux = self.precompute()

        def body(module: "RolloutModel", carry, xs_t):
            window, state = carry
            parts = []
            if const is not None:
                parts.append(const)
            if pres is not None:
                parts.append(_flatten_window(xs_t))
            parts.append(_flatten_window(window))
            x_t = jnp.concatenate(parts, axis=-1)
            if aux is None:
                delta, state = module.step(x_t, state)
            else:
                delta, state = module.step(x_t, state, aux)
            out = window[:, -1] + delta  # residual prediction (unet.py:196)
            window = jnp.concatenate([window[:, 1:], out[:, None]], axis=1)
            return (window, state), out

        scan = nn.scan(
            wrap_remat(body, self.remat, self.remat_policy),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        _, outs = scan(self, (window0, state0), xs)
        # outs: [steps, B, (F), H, W, C] -> [B, steps, C, (F), H, W]
        outs = jnp.moveaxis(outs, 0, 1)
        return _to_channels_first(outs)
