#!/usr/bin/env python3
"""Regenerate the committed WeatherBench-layout zarr fixture.

Writes a tiny tree at `tests/fixtures/wb_zarr/` in the reference's on-disk
layout (`/root/reference/src/dlwpbench/data/datasets/datasets.py:277-298`):
per-variable directories of yearly zarr stores plus a `constants/` store,
with CF-encoded time coordinates and xarray `_ARRAY_DIMENSIONS` attrs.

Deterministic (fixed seed); run from the repo root:
    python tests/fixtures/make_wb_fixture.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from dlwpbench_tpu.data import zarr_lite  # noqa: E402

H, W = 8, 16
STEPS_PER_DAY = 4  # 6-hourly
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "wb_zarr")


def field(rng, t, extra_shape=()):
    """Smooth random-walk field [T, *extra, H, W]."""
    base = np.cumsum(
        0.3 * rng.standard_normal((t, *extra_shape, H, W)), axis=0
    )
    lat = np.linspace(-1, 1, H)[:, None]
    return (base + 3.0 * lat).astype(np.float32)


def year_hours(year, n_days):
    start = np.datetime64(f"{year}-01-01T00:00")
    hours = np.arange(n_days * STEPS_PER_DAY) * (24 // STEPS_PER_DAY)
    epoch = np.datetime64("1979-01-01T00:00")
    offset = (start - epoch) // np.timedelta64(1, "h")
    return (offset + hours).astype("int64")


def main():
    rng = np.random.default_rng(42)
    lat = np.linspace(-87.1875, 87.1875, H).astype(np.float32)
    lon = (np.arange(W) * (360.0 / W)).astype(np.float32)
    time_attrs = {"units": "hours since 1979-01-01 00:00:00",
                  "calendar": "proleptic_gregorian"}

    years = [(1979, 10), (1980, 8)]  # (year, n_days) — two stores per var

    def write_var(dirname, varname, extra_dims=(), extra_coords=None,
                  scale=1.0, offset=0.0):
        for year, n_days in years:
            t = n_days * STEPS_PER_DAY
            extra_shape = tuple(
                len(extra_coords[d]) for d in extra_dims
            ) if extra_dims else ()
            data = (field(rng, t, extra_shape) * scale + offset).astype(np.float32)
            coords = {
                "time": (("time",), year_hours(year, n_days), time_attrs),
                "lat": (("lat",), lat),
                "lon": (("lon",), lon),
            }
            if extra_dims:
                for d in extra_dims:
                    coords[d] = ((d,), np.asarray(extra_coords[d]))
            zarr_lite.write_dataset(
                os.path.join(ROOT, dirname, f"{varname}_{year}_5.625deg.zarr"),
                {varname: (("time", *extra_dims, "lat", "lon"), data)},
                coords,
            )

    # prognostic: msl (untabled scale to prove manual stats engage),
    # stream250, and z with two pressure levels (exercises the level branch
    # + computed-stats fallback since z is not in the manual tables)
    write_var("msl", "msl", scale=1093.0, offset=101155.0)
    write_var("stream250", "stream250", scale=6.6e7, offset=-8.0e5)
    write_var("z", "z", extra_dims=("level",),
              extra_coords={"level": np.array([300, 500], dtype="int64")},
              scale=800.0, offset=54000.0)
    # prescribed: tisr lives under the long directory name, array named tisr
    write_var("toa_incident_solar_radiation", "tisr", scale=0.32, offset=0.25)

    # constants: one store holding all four fields
    lat2d, lon2d = np.meshgrid(lat, lon, indexing="ij")
    zarr_lite.write_dataset(
        os.path.join(ROOT, "constants", "constants_5.625deg.zarr"),
        {
            "orography": (("lat", "lon"), 840.0 * rng.random((H, W)).astype(np.float32)),
            "lsm": (("lat", "lon"), (rng.random((H, W)) > 0.6).astype(np.float32)),
            "lat2d": (("lat", "lon"), lat2d.astype(np.float32)),
            "lon2d": (("lat", "lon"), lon2d.astype(np.float32)),
        },
        {"lat": (("lat",), lat), "lon": (("lon",), lon)},
    )
    print(f"fixture written to {ROOT}")


if __name__ == "__main__":
    main()
