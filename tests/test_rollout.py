"""Rollout semantics parity: the `lax.scan` rollout must reproduce the
reference's Python-loop forward exactly (teacher forcing, context blending,
prescribed windowing, residual add — `unet.py:143-203`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlwpbench_tpu.models.unet import UNet, UNetHPX


def reference_style_rollout(apply_step, const, pres, prog, ctx):
    """Literal transliteration of the reference forward loop (channel-first)."""
    T = prog.shape[1]
    outs = []
    for t in range(ctx, T):
        t_start = max(0, t - ctx)
        if t == ctx:
            prognostic_t = prog[:, t_start:t]
        else:
            prognostic_t = np.concatenate(
                [prog[:, t_start:ctx], np.stack(outs, 1)[:, -ctx:]], axis=1
            )
        parts = []
        if const is not None:
            parts.append(const[:, 0])
        if pres is not None:
            p = pres[:, t - ctx : t]
            parts.append(p.reshape(p.shape[0], -1, *p.shape[3:]))
        parts.append(
            prognostic_t.reshape(prognostic_t.shape[0], -1, *prognostic_t.shape[3:])
        )
        x_t = np.concatenate(parts, axis=1)
        out = prognostic_t[:, -1] + apply_step(x_t)
        outs.append(np.asarray(out))
    return np.stack(outs, 1)


@pytest.mark.parametrize("ctx", [1, 2])
def test_scan_rollout_matches_reference_loop(ctx):
    rng = jax.random.PRNGKey(0)
    B, T, Cc, Cp, Cq, H, W = 2, 5, 2, 1, 3, 16, 32
    m = UNet(
        constant_channels=Cc,
        prescribed_channels=Cp,
        prognostic_channels=Cq,
        hidden_channels=(4, 8),
        context_size=ctx,
    )
    r = np.random.default_rng(1)
    const = jnp.asarray(r.standard_normal((B, 1, Cc, H, W)), jnp.float32)
    pres = jnp.asarray(r.standard_normal((B, T, Cp, H, W)), jnp.float32)
    prog = jnp.asarray(r.standard_normal((B, T, Cq, H, W)), jnp.float32)

    params = m.init(rng, const, pres, prog)
    got = np.asarray(jax.jit(m.apply)(params, const, pres, prog))

    step_jit = jax.jit(lambda p, x: m.apply(p, x, None, method="step")[0])

    def apply_step(x_cf):
        # channel-first -> channels-last, run the step net, back
        x = jnp.moveaxis(jnp.asarray(x_cf), 1, -1)
        return np.moveaxis(np.asarray(step_jit(params, x)), -1, 1)

    want = reference_style_rollout(
        apply_step, np.asarray(const), np.asarray(pres), np.asarray(prog), ctx
    )
    assert got.shape == (B, T - ctx, Cq, H, W)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_no_prescribed_no_constants():
    rng = jax.random.PRNGKey(0)
    m = UNet(
        constant_channels=0,
        prescribed_channels=0,
        prognostic_channels=2,
        hidden_channels=(4,),
        context_size=1,
    )
    prog = jnp.ones((1, 4, 2, 8, 16))
    params = m.init(rng, None, None, prog)
    out = m.apply(params, None, None, prog)
    assert out.shape == (1, 3, 2, 8, 16)


def test_healpix_unet_rollout():
    rng = jax.random.PRNGKey(0)
    m = UNetHPX(
        constant_channels=1,
        prescribed_channels=0,
        prognostic_channels=2,
        hidden_channels=(4, 8),
        context_size=1,
    )
    const = jnp.ones((2, 1, 1, 12, 8, 8))
    prog = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 2, 12, 8, 8)), jnp.float32
    )
    params = m.init(rng, const, None, prog)
    out = m.apply(params, const, None, prog)
    assert out.shape == (2, 3, 2, 12, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
