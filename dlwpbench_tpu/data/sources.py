"""Data sources: build train/val/test `WindowedWeatherDataset`s from a config.

Three source types (config group `data/`):
- `synthetic`  — deterministic ERA5-like random fields (tests/benchmarks).
- `NavierStokes` — trajectories generated on-device by the pseudo-spectral
  solver (`ns2d.py`); the reference's absent `nsbench` track rebuilt.
- `WeatherBenchZarr` — the reference's zarr tree layout
  (`data/datasets/datasets.py:277-298`): per-variable directories of yearly
  zarr stores, split by date range, z-score normalized per variable/level.
"""

from __future__ import annotations

import os
import numpy as np

from dlwpbench_tpu.data.dataset import (
    VariableStats,
    WindowedWeatherDataset,
    biweekly_init_indices,
    compute_stats,
    synthetic_weatherbench,
)


def build_datasets(data_cfg: dict, training_cfg: dict, validation_cfg: dict,
                   testing_cfg: dict | None = None, context_size: int = 1):
    """Returns (train_ds, val_ds, test_ds, stats) per the config."""
    typ = data_cfg["type"]
    if typ == "synthetic":
        return _synthetic(data_cfg, training_cfg, validation_cfg, testing_cfg, context_size)
    if typ == "NavierStokes":
        return _navier_stokes(data_cfg, training_cfg, validation_cfg, testing_cfg, context_size)
    if typ == "WeatherBenchZarr":
        return _weatherbench_zarr(data_cfg, training_cfg, validation_cfg, testing_cfg, context_size)
    raise ValueError(f"unknown data type {typ!r}")


def _split_windows(const, pres, prog, fractions=(0.7, 0.15, 0.15)):
    T = prog.shape[0]
    n_train = int(T * fractions[0])
    n_val = int(T * fractions[1])
    splits = []
    for lo, hi in [(0, n_train), (n_train, n_train + n_val), (n_train + n_val, T)]:
        splits.append(
            (
                const,
                None if pres is None else pres[lo:hi],
                prog[lo:hi],
            )
        )
    return splits


def _mk(split, seq, ctx, noise, seed):
    const, pres, prog = split
    return WindowedWeatherDataset(
        prognostic=prog,
        constants=const,
        prescribed=pres,
        sequence_length=seq,
        context_size=ctx,
        noise=noise,
        seed=seed,
    )


def _synthetic(d, tr, va, te, ctx):
    const, pres, prog = synthetic_weatherbench(
        n_time=int(d.get("n_time", 128)),
        nlat=int(d["height"]),
        nlon=int(d["width"]),
        n_prognostic=int(d["prognostic_channels"]),
        n_prescribed=int(d["prescribed_channels"]),
        n_constants=int(d["constant_channels"]),
        healpix_nside=d.get("healpix_nside"),
        seed=int(d.get("seed", 0)),
    )
    stats = {"prognostic": compute_stats(prog)}
    if d.get("normalize", True):
        prog = np.nan_to_num(stats["prognostic"].normalize(prog)).astype(np.float32)
    splits = _split_windows(const, pres, prog)
    train = _mk(splits[0], int(tr["sequence_length"]), ctx, float(tr.get("noise", 0)), 1)
    val = _mk(splits[1], int(va["sequence_length"]), ctx, 0.0, 2)
    test_seq = int((te or va)["sequence_length"])
    test = _mk(splits[2], test_seq, ctx, 0.0, 3)

    # Forecast protocol: biweekly Monday/Thursday 11:00 UTC inits
    # (reference `evaluate.py:56-77`); the synthetic timeline is 6-hourly
    # from `start_date` and the test split inherits its tail.
    timedelta_h = int(d.get("timedelta", 6))
    start = np.datetime64(str(d.get("start_date", "2017-01-01T05:00")))
    n_total = prog.shape[0]
    times = start + np.arange(n_total) * np.timedelta64(timedelta_h, "h")
    test_t0 = n_total - splits[2][2].shape[0]
    test_times = times[test_t0:]
    idx = biweekly_init_indices(test_times, test_times[0], test_times[-1])
    idx = idx[idx + test_seq + 1 <= len(test_times)]
    if len(idx):
        test.init_indices = idx.tolist()
    return train, val, test, stats


def _navier_stokes(d, tr, va, te, ctx):
    from dlwpbench_tpu.data import ns2d

    traj = ns2d.generate_dataset(
        seed=int(d.get("seed", 7)),
        n=int(d["n"]),
        batch=int(d.get("n_trajectories", 16)),
        nu=float(d.get("nu", 1e-3)),
        dt=float(d.get("dt", 1e-3)),
        record_steps=int(d.get("record_steps", 50)),
        inner_steps=int(d.get("inner_steps", 1000)),
    )  # [B, T, n, n]
    stats = {"vorticity": compute_stats(traj)}
    if d.get("normalize", True):
        traj = stats["vorticity"].normalize(traj).astype(np.float32)
    B = traj.shape[0]
    n_train = max(1, int(B * 0.7))
    n_val = max(1, int(B * 0.15))
    # trajectories -> one long time axis per split, channel dim added
    def as_prog(a):
        return a.reshape(-1, *a.shape[2:])[:, None]  # [B*T, 1, n, n]

    tr_split = (None, None, as_prog(traj[:n_train]))
    va_split = (None, None, as_prog(traj[n_train : n_train + n_val]))
    te_split = (None, None, as_prog(traj[n_train + n_val :]))
    train = _mk(tr_split, int(tr["sequence_length"]), ctx, float(tr.get("noise", 0)), 1)
    val = _mk(va_split, int(va["sequence_length"]), ctx, 0.0, 2)
    test = _mk(te_split, int((te or va)["sequence_length"]), ctx, 0.0, 3)
    return train, val, test, stats


def _weatherbench_zarr(d, tr, va, te, ctx):
    """Load the reference's zarr tree with xarray (per-variable yearly files).

    Requires the data to exist on disk at `data_path` in the reference layout;
    everything else (role split, per-level normalization, NaN handling)
    mirrors `datasets.py:308-416`.
    """
    try:
        import xarray as xr
    except ImportError as e:
        raise ImportError(
            "WeatherBenchZarr requires xarray/zarr, which are not available "
            "in this image; use data=synthetic or data=navier_stokes instead."
        ) from e

    path = d["data_path"]
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"WeatherBench data not found at {path!r}; download/convert it "
            "first (see data/processing tools) or use data=synthetic."
        )
    engine = d.get("engine", "zarr")
    td = int(d.get("timedelta", 6))

    def load_split(start, stop):
        names = list(d["prognostic_variable_names_and_levels"]) + list(
            d.get("prescribed_variable_names", [])
        )
        fpaths = []
        for v in names:
            fpaths += sorted(
                __import__("glob").glob(os.path.join(path, v, "*"))
            )
        if d.get("constant_names"):
            fpaths += sorted(__import__("glob").glob(os.path.join(path, "constants", "*")))
        ds = xr.open_mfdataset(fpaths, engine=engine).sel(
            time=slice(start, stop, td)
        )
        return ds.load()

    raw_stats: dict[str, VariableStats] = {}

    def to_arrays(ds):
        prog_list, pres_list, const_list = [], [], []
        for v, levels in d["prognostic_variable_names_and_levels"].items():
            da = ds[v]
            if levels:
                for lv in levels:
                    arr = da.sel(level=lv).values
                    key = f"{v}{lv}"
                    st = raw_stats.setdefault(key, compute_stats(arr))
                    prog_list.append(np.nan_to_num(st.normalize(arr)))
            else:
                arr = da.values
                st = raw_stats.setdefault(v, compute_stats(arr))
                prog_list.append(np.nan_to_num(st.normalize(arr)))
        for v in d.get("prescribed_variable_names", []):
            arr = ds[v].values
            st = raw_stats.setdefault(v, compute_stats(arr))
            pres_list.append(np.nan_to_num(st.normalize(arr)))
        for v in d.get("constant_names", []):
            arr = ds[v].values
            st = raw_stats.setdefault(v, compute_stats(arr))
            const_list.append(np.nan_to_num(st.normalize(arr)))
        prog = np.stack(prog_list, 1).astype(np.float32)
        pres = np.stack(pres_list, 1).astype(np.float32) if pres_list else None
        const = np.stack(const_list, 0).astype(np.float32) if const_list else None
        return const, pres, prog

    tr_split = to_arrays(load_split(d["train_start_date"], d["train_stop_date"]))
    va_split = to_arrays(load_split(d["val_start_date"], d["val_stop_date"]))
    te_split = to_arrays(load_split(d["test_start_date"], d["test_stop_date"]))
    train = _mk(tr_split, int(tr["sequence_length"]), ctx, float(tr.get("noise", 0)), 1)
    val = _mk(va_split, int(va["sequence_length"]), ctx, 0.0, 2)
    test = _mk(te_split, int((te or va)["sequence_length"]), ctx, 0.0, 3)
    return train, val, test, raw_stats
