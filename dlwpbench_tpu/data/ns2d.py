"""2D incompressible Navier-Stokes pseudo-spectral solver (vorticity form).

The reference repo's README points to an `src/nsbench` Navier-Stokes
synthetic benchmark that is absent from the checkout (SURVEY.md); the
benchmark follows the FNO setup (Li et al. 2021) also used by the
dlwp-benchmark paper (arXiv:2407.14129):

    dw/dt + u . grad(w) = nu * Lap(w) + f,      div(u) = 0
    f(x, y) = 0.1 * (sin(2*pi*(x+y)) + cos(2*pi*(x+y)))

on the periodic unit torus, initial vorticity drawn from the Gaussian
random field N(0, 7^{3/2} (-Lap + 49 I)^{-2.5}).

TPU-first design: the state lives in Fourier space; each step is a few
rfft2/irfft2 pairs plus elementwise spectral algebra — all MXU/VPU friendly,
batched over an ensemble of trajectories, and the time loop is `lax.scan`
inside one jit so data generation runs at device speed.  Time integration is
Crank-Nicolson for the viscous term with explicit (Heun) advection and 2/3
dealiasing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NSGrid(NamedTuple):
    n: int
    kx: jax.Array  # [n, n//2+1]
    ky: jax.Array
    lap: jax.Array  # -(kx^2+ky^2), 0 mode zeroed for inversion
    inv_lap: jax.Array
    dealias: jax.Array  # 2/3-rule mask


def make_grid(n: int) -> NSGrid:
    k = np.fft.fftfreq(n, 1.0 / n)  # integer wavenumbers
    kr = np.fft.rfftfreq(n, 1.0 / n)
    ky = np.broadcast_to(k[:, None], (n, n // 2 + 1)) * (2 * np.pi)
    kx = np.broadcast_to(kr[None, :], (n, n // 2 + 1)) * (2 * np.pi)
    k2 = kx**2 + ky**2
    inv_lap = np.where(k2 == 0, 0.0, -1.0 / np.where(k2 == 0, 1.0, k2))
    cutoff = n // 3  # keep |k| <= n/3 (2/3 rule)
    mask = (np.abs(k[:, None]) <= cutoff) & (np.abs(kr[None, :]) <= cutoff)
    return NSGrid(
        n=n,
        kx=jnp.asarray(kx, jnp.float32),
        ky=jnp.asarray(ky, jnp.float32),
        lap=jnp.asarray(-k2, jnp.float32),
        inv_lap=jnp.asarray(inv_lap, jnp.float32),
        dealias=jnp.asarray(mask),
    )


def gaussian_random_field(key: jax.Array, n: int, batch: int = 1) -> jax.Array:
    """Initial vorticity ~ N(0, 7^{3/2} (-Lap + 49 I)^{-2.5}) (FNO spec)."""
    k = jnp.fft.fftfreq(n, 1.0 / n) * 2 * jnp.pi
    k2 = k[:, None] ** 2 + k[None, :] ** 2
    # sqrt of the covariance spectrum; tau=7, alpha=2.5, d=2
    sqrt_eig = (n**1.0) * jnp.sqrt(2.0) * (7.0 ** (1.5)) * ((k2 + 49.0) ** (-1.25))
    sqrt_eig = sqrt_eig.at[0, 0].set(0.0)
    noise = jax.random.normal(key, (batch, n, n), jnp.float32)
    xi = jnp.fft.fft2(noise)
    w_hat = sqrt_eig[None] * xi
    return jnp.real(jnp.fft.ifft2(w_hat))


def default_forcing(n: int) -> jax.Array:
    x = np.linspace(0, 1, n, endpoint=False)
    X, Y = np.meshgrid(x, x, indexing="ij")
    return jnp.asarray(
        0.1 * (np.sin(2 * np.pi * (X + Y)) + np.cos(2 * np.pi * (X + Y))),
        jnp.float32,
    )


def _nonlinear(w_hat: jax.Array, g: NSGrid) -> jax.Array:
    """Dealiased advection term -(u . grad w) in spectral space."""
    psi_hat = -w_hat * g.inv_lap  # streamfunction: Lap(psi) = -w
    u_hat = 1j * g.ky * psi_hat  # u = d(psi)/dy
    v_hat = -1j * g.kx * psi_hat  # v = -d(psi)/dx
    wx_hat = 1j * g.kx * w_hat
    wy_hat = 1j * g.ky * w_hat
    u = jnp.fft.irfft2(u_hat, (g.n, g.n))
    v = jnp.fft.irfft2(v_hat, (g.n, g.n))
    wx = jnp.fft.irfft2(wx_hat, (g.n, g.n))
    wy = jnp.fft.irfft2(wy_hat, (g.n, g.n))
    adv = u * wx + v * wy
    return -jnp.fft.rfft2(adv) * g.dealias


@functools.partial(jax.jit, static_argnames=("n", "record_steps", "inner_steps"))
def simulate(
    w0: jax.Array,
    *,
    n: int,
    nu: float = 1e-3,
    dt: float = 1e-3,
    record_steps: int = 50,
    inner_steps: int = 1000,
    forcing: jax.Array | None = None,
) -> jax.Array:
    """Integrate vorticity forward; record every `inner_steps * dt` time units.

    Args:
      w0: [B, n, n] initial vorticity.
      record_steps: number of recorded snapshots (after the initial state).

    Returns:
      [B, record_steps + 1, n, n] trajectory including w0.
    """
    g = make_grid(n)
    if forcing is None:
        forcing = default_forcing(n)
    f_hat = jnp.fft.rfft2(forcing)[None]

    nu = jnp.float32(nu)
    dt = jnp.float32(dt)
    # Crank-Nicolson factors for the viscous term
    cn_num = 1.0 + 0.5 * dt * nu * g.lap
    cn_den = 1.0 / (1.0 - 0.5 * dt * nu * g.lap)

    def one_step(w_hat, _):
        nl1 = _nonlinear(w_hat, g) + f_hat
        w_mid = (w_hat * cn_num + dt * nl1) * cn_den
        nl2 = _nonlinear(w_mid, g) + f_hat
        w_next = (w_hat * cn_num + dt * 0.5 * (nl1 + nl2)) * cn_den
        return w_next, None

    def record(w_hat, _):
        w_hat, _ = jax.lax.scan(one_step, w_hat, None, length=inner_steps)
        return w_hat, jnp.fft.irfft2(w_hat, (n, n))

    w_hat0 = jnp.fft.rfft2(w0)
    _, traj = jax.lax.scan(record, w_hat0, None, length=record_steps)
    traj = jnp.moveaxis(traj, 0, 1)  # [B, record_steps, n, n]
    return jnp.concatenate([w0[:, None], traj], axis=1)


def generate_dataset(
    seed: int,
    n: int = 64,
    batch: int = 8,
    nu: float = 1e-3,
    dt: float = 1e-3,
    record_steps: int = 50,
    inner_steps: int = 1000,
) -> np.ndarray:
    """Convenience wrapper: GRF init + simulate -> numpy [B, T, n, n]."""
    key = jax.random.PRNGKey(seed)
    w0 = gaussian_random_field(key, n, batch)
    return np.asarray(
        simulate(
            w0,
            n=n,
            nu=nu,
            dt=dt,
            record_steps=record_steps,
            inner_steps=inner_steps,
        )
    )
