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

import glob
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


def _find_data_array(group, want: str):
    """Locate the data variable in a per-variable yearly store.

    WeatherBench directory names differ from the variable names inside
    (e.g. `toa_incident_solar_radiation/` holds `tisr`), so fall back to
    the unique array that is not a coordinate (its name is not a dim).
    """
    if want in group:
        return want
    candidates = []
    for k in group.array_keys():
        arr = group[k]
        if k not in arr.dims and k not in ("level",):
            candidates.append(k)
    if len(candidates) == 1:
        return candidates[0]
    raise ValueError(
        f"cannot identify data variable in {group.path} "
        f"(candidates: {candidates})"
    )


def _load_variable_series(path: str, var_dir: str):
    """Concatenate a variable's yearly zarr stores along time.

    Returns (times[T], values[T, (level,) (face,) H, W], dims, levels).
    Mirrors `xr.open_mfdataset(glob(...))` + time sort
    (reference `datasets.py:291-298`).
    """
    from dlwpbench_tpu.data import zarr_lite

    stores = sorted(glob.glob(os.path.join(path, var_dir, "*")))
    stores = [s for s in stores if os.path.isdir(s)]
    if not stores:
        raise FileNotFoundError(f"no zarr stores under {path}/{var_dir}")
    times, chunks, dims, levels = [], [], None, None
    for s in stores:
        g = zarr_lite.ZarrGroup.open(s)
        name = _find_data_array(g, os.path.basename(var_dir))
        arr = g[name]
        if "time" not in arr.dims:
            raise ValueError(f"{s}/{name} has no time dim: {arr.dims}")
        if arr.dims.index("time") != 0:
            raise NotImplementedError("time must be the leading dim")
        times.append(zarr_lite.read_time_coord(g["time"]))
        chunks.append(arr.read())
        dims = arr.dims
        if "level" in g:
            levels = g["level"].read()
    t = np.concatenate(times)
    v = np.concatenate(chunks, axis=0)
    order = np.argsort(t, kind="stable")
    return t[order], v[order], dims, levels


def _load_constants(path: str, names):
    """Read constant fields from the `constants/` store(s)."""
    from dlwpbench_tpu.data import zarr_lite

    out = {}
    stores = sorted(glob.glob(os.path.join(path, "constants", "*")))
    stores = [s for s in stores if os.path.isdir(s)]
    if os.path.exists(os.path.join(path, "constants", ".zgroup")):
        stores = [os.path.join(path, "constants")] + stores
    for s in stores:
        g = zarr_lite.ZarrGroup.open(s)
        for k in g.array_keys():
            arr = g[k]
            if k in names and k not in arr.dims and "time" not in arr.dims:
                out[k] = arr.read()
    missing = [n for n in names if n not in out]
    if missing:
        raise FileNotFoundError(f"constants {missing} not found under {path}/constants")
    return out


def _weatherbench_zarr(d, tr, va, te, ctx):
    """The reference's zarr tree via the first-party reader (`zarr_lite`).

    Layout, role split, manual normalization tables, NaN-fill and
    downscaling all mirror `datasets.py:264-416`; the xarray/zarr stack is
    replaced by `zarr_lite` (numpy + stdlib) because neither is installable
    in this image.
    """
    from dlwpbench_tpu.data import stats_tables
    from dlwpbench_tpu.data.preprocessing import coarsen_mean

    path = d["data_path"]
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"WeatherBench data not found at {path!r}; convert it first "
            "(scripts/nc_to_zarr.py) or use data=synthetic."
        )
    td = int(d.get("timedelta", 6))
    normalize = bool(d.get("normalize", True))
    downscale = int(d.get("downscale_factor", 1))
    train_year = int(str(d["train_start_date"])[:4])
    table = stats_tables.select_table(d.get("statistics"), train_year)

    prog_spec = d["prognostic_variable_names_and_levels"]
    pres_names = list(d.get("prescribed_variable_names", []))
    const_names = list(d.get("constant_names", []))

    # --- load every variable's full series once -------------------------
    series = {}  # var -> (times, values, dims, levels)
    for v in list(prog_spec) + pres_names:
        series[v] = _load_variable_series(path, stats_tables.file_name_for(table, v))
    const_raw = _load_constants(path, const_names) if const_names else {}

    raw_stats: dict[str, VariableStats] = {}

    def norm(key, var, arr, level=None):
        st = stats_tables.stats_for(table, var, level) if normalize else None
        if st is None:
            st = raw_stats.setdefault(key, compute_stats(arr))
        else:
            raw_stats.setdefault(key, st)
        if not normalize:
            return np.nan_to_num(arr)
        return np.nan_to_num(st.normalize(arr))

    def channels(var, arr, dims, levels):
        """Split a loaded series into per-level [T, ...] channels."""
        want = prog_spec.get(var, [])
        if want:
            if levels is None or "level" not in dims:
                raise ValueError(f"{var} has no level dim but levels {want} requested")
            ax = dims.index("level")
            lv_idx = {float(l): i for i, l in enumerate(np.asarray(levels).ravel())}
            for lv in want:
                a = np.take(arr, lv_idx[float(lv)], axis=ax)
                yield f"{var}{lv}", norm(f"{var}{lv}", var, a, lv)
        else:
            yield var, norm(var, var, arr)

    def ds_space(a):
        return coarsen_mean(a, downscale) if downscale > 1 else a

    def select(times, values, start, stop):
        t0 = np.datetime64(str(start))
        t1 = np.datetime64(str(stop)) + np.timedelta64(1, "D")  # inclusive date
        m = (times >= t0) & (times < t1)
        return values[m][::td]

    def to_arrays(start, stop):
        prog_list, pres_list = [], []
        for v in prog_spec:
            t, a, dims, levels = series[v]
            for _, ch in channels(v, a, dims, levels):
                prog_list.append(ds_space(select(t, ch, start, stop)))
        for v in pres_names:
            t, a, _, _ = series[v]
            pres_list.append(ds_space(select(t, norm(v, v, a), start, stop)))
        prog = np.stack(prog_list, 1).astype(np.float32)
        pres = np.stack(pres_list, 1).astype(np.float32) if pres_list else None
        const = None
        if const_names:
            const = np.stack(
                [ds_space(norm(c, c, const_raw[c])) for c in const_names], 0
            ).astype(np.float32)
        return const, pres, prog

    tr_split = to_arrays(d["train_start_date"], d["train_stop_date"])
    va_split = to_arrays(d["val_start_date"], d["val_stop_date"])
    te_split = to_arrays(d["test_start_date"], d["test_stop_date"])
    train = _mk(tr_split, int(tr["sequence_length"]), ctx, float(tr.get("noise", 0)), 1)
    val = _mk(va_split, int(va["sequence_length"]), ctx, 0.0, 2)
    test_seq = int((te or va)["sequence_length"])
    test = _mk(te_split, test_seq, ctx, 0.0, 3)

    # attach per-frame valid times (real calendar) so consumers can
    # stratify by month (monthly climatology / ACC) and report init dates
    t_ref = series[next(iter(prog_spec))][0]

    def split_times(start, stop):
        lo = np.datetime64(str(start))
        hi = np.datetime64(str(stop)) + np.timedelta64(1, "D")
        return t_ref[(t_ref >= lo) & (t_ref < hi)][::td]

    train.times = split_times(d["train_start_date"], d["train_stop_date"])
    val.times = split_times(d["val_start_date"], d["val_stop_date"])
    test.times = split_times(d["test_start_date"], d["test_stop_date"])

    # Forecast protocol on the test split: biweekly Monday/Thursday 11:00
    # UTC init dates (reference `evaluate.py:56-77` builds these itself for
    # evaluation regardless of the train config's init_dates; the synthetic
    # source applies the same rule).
    test_times = test.times
    if len(test_times):
        idx = biweekly_init_indices(test_times, test_times[0], test_times[-1])
        idx = idx[idx + test_seq + 1 <= len(test_times)]
        if len(idx):
            test.init_indices = idx.tolist()
    return train, val, test, raw_stats
