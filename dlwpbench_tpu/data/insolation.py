"""Analytic top-of-atmosphere solar insolation.

Reference: `data/datasets/add_insolation.py:9-73` — orbital-mechanics
approximation with 1995 constants (obliquity 23.4441 deg, eccentricity
0.016715, perihelion longitude 282.7 deg).  Used to synthesize the `tisr`
prescribed forcing for arbitrary dates (e.g. rollouts beyond the stored
data, `datasets.py:354-369`).

Pure numpy for dataset preparation plus a jittable JAX variant taking
fractional days-of-year directly (for on-device forcing generation inside a
rollout).
"""

from __future__ import annotations

import numpy as np


_EPS = 23.4441 * np.pi / 180.0
_ECC = 0.016715
_OM = 282.7 * np.pi / 180.0


def _solar_geometry(days_arr, lat, lon, xp):
    beta = (1 - _ECC**2) ** 0.5
    lambda_m0 = _ECC * (1.0 + beta) * xp.sin(_OM)
    lambda_m = lambda_m0 + 2.0 * xp.pi * (days_arr - 80.5) / 365.0
    lam = lambda_m + 2.0 * _ECC * xp.sin(lambda_m - _OM)
    dec = xp.arcsin(xp.sin(_EPS) * xp.sin(lam))
    h = 2 * xp.pi * (days_arr + lon / 360.0)
    rho = (1.0 - _ECC**2) / (1.0 + _ECC * xp.cos(lam - _OM))
    sol = (
        xp.sin(xp.pi / 180.0 * lat) * xp.sin(dec)
        - xp.cos(xp.pi / 180.0 * lat) * xp.cos(dec) * xp.cos(h)
    ) * rho**-2.0
    return sol


def insolation(dates, lat, lon, S=1.0, daily=False, enforce_2d=True, clip_zero=True):
    """Approximate solar insolation [date, lat, lon] (numpy; reference API)."""
    import pandas as pd

    lat = np.asarray(lat)
    lon = np.asarray(lon)
    if lat.ndim != lon.ndim:
        raise ValueError("'lat' and 'lon' must have the same number of dimensions")
    if lat.ndim >= 2 and lat.shape != lon.shape:
        raise ValueError(f"shape mismatch between lat {lat.shape} and lon {lon.shape}")
    if lat.ndim == 1 and enforce_2d:
        lon, lat = np.meshgrid(lon, lat)

    start_years = np.array(
        [pd.Timestamp(pd.Timestamp(d).year, 1, 1) for d in dates], dtype="datetime64[ns]"
    )
    days_arr = (np.array(dates, dtype="datetime64[ns]") - start_years) / np.timedelta64(1, "D")
    days_arr = days_arr.reshape(days_arr.shape + (1,) * lat.ndim)

    if daily:
        days_arr = 0.5 + np.round(days_arr)
        lon = np.zeros_like(lon, np.float32)
    sol = S * _solar_geometry(days_arr, lat[None], lon.astype(np.float32), np)
    if clip_zero:
        sol = np.where(sol < 0, 0.0, sol)
    return sol.astype(np.float32)


def insolation_jax(days_of_year, lat2d, lon2d, S=1.0, clip_zero=True):
    """Jittable insolation: fractional days-of-year [T] + lat/lon [H, W]."""
    import jax.numpy as jnp

    days = jnp.asarray(days_of_year)[:, None, None]
    sol = S * _solar_geometry(days, jnp.asarray(lat2d)[None], jnp.asarray(lon2d)[None], jnp)
    return jnp.where(sol < 0, 0.0, sol) if clip_zero else sol
