"""Forecast skill metrics (reference `scripts/evaluate.py:768-872`).

All metrics operate on arrays shaped [sample, time, lat, lon] per variable
(the reference's xarray datasets have dims sample/time/lat/lon) and are
jit-friendly pure functions; the evaluation driver wraps them per variable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _lat_w(lats_deg: np.ndarray) -> jnp.ndarray:
    w = np.cos(np.deg2rad(lats_deg))
    return jnp.asarray(w / w.mean())


def weighted_rmse(
    outputs: jax.Array, targets: jax.Array, lats_deg: np.ndarray
) -> jax.Array:
    """Lat-weighted RMSE per lead time (WeatherBench eq. 2).

    outputs/targets: [sample, time, lat, lon] -> [time].
    Reference `evaluate.py:795-803`: mean over sample/lat/lon, then sqrt.
    """
    w = _lat_w(lats_deg)[None, None, :, None]
    return jnp.sqrt((w * (outputs - targets) ** 2).mean(axis=(0, 2, 3)))


def acc(
    outputs: jax.Array,
    targets: jax.Array,
    climatology: jax.Array,
    lats_deg: np.ndarray,
) -> jax.Array:
    """Anomaly correlation coefficient vs climatology per lead time.

    WeatherBench eq. (A1); reference `evaluate.py:806-821`.
    climatology: broadcastable to outputs (e.g. [1, time, lat, lon] monthly
    climatology values aligned to forecast valid times).
    """
    w = _lat_w(lats_deg)[None, None, :, None]
    do = outputs - climatology
    dt = targets - climatology
    nom = (w * do * dt).mean(axis=(0, 2, 3))
    denom = jnp.sqrt(
        (w * do**2).mean(axis=(0, 2, 3)) * (w * dt**2).mean(axis=(0, 2, 3))
    )
    return nom / denom


def zonal_mean_rmse(
    outputs: jax.Array,
    targets: jax.Array,
    lats_deg: np.ndarray,
    lat_bands: list[tuple[float, float]] | None = None,
) -> jax.Array:
    """Physical-soundness RMSE of time/zonal-mean state (reference
    `evaluate.py:833-858`): average over time and lon, RMSE over remaining
    dims, optionally restricted to latitude bands (e.g. trade winds
    [(-20,-10),(10,20)], southern westerlies [(-55,-45)])."""
    avg_out = outputs.mean(axis=(1, 3))  # [sample, lat]
    avg_tar = targets.mean(axis=(1, 3))
    se = (avg_out - avg_tar) ** 2
    if lat_bands is not None:
        mask = np.zeros(len(lats_deg), bool)
        for lo, hi in lat_bands:
            mask |= (lats_deg >= lo) & (lats_deg <= hi)
        se = se[:, mask]
    return jnp.sqrt(se.mean())


def frobenius_norm(outputs: jax.Array, targets: jax.Array) -> jax.Array:
    """Accumulated-error Frobenius norm per lead time."""
    return jnp.sqrt(((outputs - targets) ** 2).sum(axis=(0, 2, 3)))


def rmse_months_11_12(
    outputs: jax.Array,
    targets: jax.Array,
    timedelta_hours: float,
) -> jax.Array | None:
    """Year-long-rollout soundness: RMSE of the month-11..12 mean state.

    Reference `evaluate.py:864-872`: average outputs and targets over lead
    times in [334 d, 365 d], then sqrt of the mean squared difference over
    all remaining dims (unweighted, as in the reference).  Returns None
    when the rollout is shorter than 334 days.
    """
    T = outputs.shape[1]
    # the first forecast step has lead time dt, not 0 (reference builds
    # coords with pd.timedelta_range(start=dt, ...), `evaluate.py:341`)
    lead_h = (np.arange(T) + 1) * float(timedelta_hours)
    sel = (lead_h >= 334 * 24) & (lead_h <= 365 * 24)
    if not sel.any():
        return None
    avg_out = outputs[:, sel].mean(axis=1)
    avg_tar = targets[:, sel].mean(axis=1)
    return jnp.sqrt(((avg_out - avg_tar) ** 2).mean())
