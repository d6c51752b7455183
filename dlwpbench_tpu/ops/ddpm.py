"""DDPM noise scheduler (replaces `diffusers.DDPMScheduler` for the
PDE-Refiner-style diffusion track; reference `scripts/train.py:62-89,226-258`
and `models/diffusion_models/modern_unet/modern_unet.py:175-208`).

Implements exactly the pieces the reference uses:
- custom `trained_betas` = [min_noise_std**(k/K) for k in reversed(range(K+1))]
  (`train.py:76`);
- `add_noise(sample, noise, t)` = sqrt(acp_t)*sample + sqrt(1-acp_t)*noise;
- v-prediction target: v = sqrt(acp_t)*noise - sqrt(1-acp_t)*sample
  (`train.py:255`);
- the reverse `step(model_output, t, sample)` with v-prediction and
  `clip_sample=False`, matching diffusers' DDPMScheduler math.

Everything is a pure function over a precomputed `DDPMSchedule` pytree so it
jits and vmaps freely (per-sample timesteps etc.).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DDPMSchedule(NamedTuple):
    betas: jax.Array  # [K+1]
    alphas: jax.Array
    alphas_cumprod: jax.Array
    num_timesteps: int


def make_refiner_schedule(num_refinement_steps: int, min_noise_std: float) -> DDPMSchedule:
    """PDE-Refiner beta schedule (reference `train.py:74-82`)."""
    K = num_refinement_steps
    betas = np.array(
        [min_noise_std ** (k / K) for k in reversed(range(K + 1))], np.float64
    )
    return _from_betas(betas)


def make_linear_schedule(num_timesteps: int, beta_start=1e-4, beta_end=0.02) -> DDPMSchedule:
    betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
    return _from_betas(betas)


def _from_betas(betas: np.ndarray) -> DDPMSchedule:
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    return DDPMSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas=jnp.asarray(alphas, jnp.float32),
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        num_timesteps=len(betas),
    )


def _extract(arr: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather arr[t] and reshape to broadcast over an ndim-dim sample."""
    v = arr[t]
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


def add_noise(
    sched: DDPMSchedule, sample: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    acp = _extract(sched.alphas_cumprod, t, sample.ndim)
    return jnp.sqrt(acp) * sample + jnp.sqrt(1.0 - acp) * noise


def v_prediction_target(
    sched: DDPMSchedule, sample: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """v = sqrt(acp)*noise - sqrt(1-acp)*sample (diffusers v-prediction)."""
    acp = _extract(sched.alphas_cumprod, t, sample.ndim)
    return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * sample


def subsampled_timesteps(
    num_train_timesteps: int, num_inference_steps: int
) -> np.ndarray:
    """diffusers `DDPMScheduler.set_timesteps` (scheduling_ddpm.py):
    step_ratio = T // K, timesteps = (arange(K) * step_ratio)[::-1].
    The reference's deployed configuration trains on a 1001-step schedule
    and infers on K=5 of its timesteps — [800, 600, 400, 200, 0]
    (`evaluate.py:197-202`; the top level 1000 is never visited, a
    reference quirk reproduced here)."""
    step_ratio = num_train_timesteps // num_inference_steps
    return (np.arange(0, num_inference_steps) * step_ratio).round()[
        ::-1
    ].astype(np.int32)


def step(
    sched: DDPMSchedule,
    model_output: jax.Array,
    t: jax.Array,
    sample: jax.Array,
    key: jax.Array = None,
    noise: jax.Array = None,
    prev_t: jax.Array = None,
) -> jax.Array:
    """One reverse-diffusion step (DDPM ancestral sampling, v-prediction,
    clip_sample=False).  `t` is a scalar timestep; adds noise unless t==0.
    Pass `noise` explicitly (e.g. for cross-framework parity tests) to skip
    the internal `jax.random.normal` draw.

    `prev_t` is the PREVIOUS timestep of the sampling trajectory — t-1 for
    full-schedule sampling (default), t - T//K when inference subsamples K
    of T timesteps (diffusers `previous_timestep`); prev_t < 0 means the
    final step (alpha_cumprod_prev = 1).

    WARNING: key=None (with noise=None) yields the posterior MEAN — no
    noise is added at ANY t.  That is only correct for the final t==0
    step (t is traced, so it cannot be checked here); ancestral sampling
    at t>0 requires a key, or the chain silently variance-collapses."""
    ndim = sample.ndim
    if prev_t is None:
        prev_t = t - 1
    prev_t = jnp.asarray(prev_t)
    acp_t = _extract(sched.alphas_cumprod, t, ndim)
    acp_prev = jnp.where(
        prev_t >= 0,
        _extract(sched.alphas_cumprod, jnp.maximum(prev_t, 0), ndim),
        1.0,
    )
    beta_t = 1.0 - acp_t / acp_prev
    alpha_t = 1.0 - beta_t

    # v-prediction -> predicted x0 and eps
    pred_x0 = jnp.sqrt(acp_t) * sample - jnp.sqrt(1.0 - acp_t) * model_output

    # DDPM posterior mean in terms of x_t and x0
    coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    mean = coef_x0 * pred_x0 + coef_xt * sample

    var = jnp.clip(beta_t * (1.0 - acp_prev) / (1.0 - acp_t), 1e-20, None)
    if noise is None:
        if key is None:
            # no key: deterministic step (valid for the t==0 final step,
            # where no noise is added; jnp.where evaluates both branches,
            # so jax.random.normal(None, ...) would crash here otherwise)
            noise = jnp.zeros_like(sample)
        else:
            noise = jax.random.normal(key, sample.shape, sample.dtype)
    return jnp.where(t > 0, mean + jnp.sqrt(var) * noise, mean)
