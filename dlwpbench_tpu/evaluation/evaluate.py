"""Forecast evaluation driver (reference `scripts/evaluate.py`).

Pipeline parity (`evaluate.py:119-416,768-872,998-1093`):
- restore the run's config + best checkpoint;
- build the test dataset (biweekly Monday/Thursday inits when dates are
  available, else sequential windows of `testing.sequence_length`);
- no-grad autoregressive rollout (jitted; the rollout loop itself is the
  in-model `lax.scan`);
- de-normalize outputs/targets with the dataset statistics;
- HEALPix runs are remapped back to lat-lon before metrics
  (`evaluate.py:298-304`);
- write `inits/outputs/targets.nc` + metrics (`rmses.nc`, `accs.nc`,
  physical-soundness zonal RMSEs, Frobenius norms) under
  `<run_dir>/evaluation/`;
- RMSE/ACC-over-leadtime plots; optional mp4 rendering via ffmpeg when
  present (`evaluate.py:419-500`).
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dlwpbench_tpu.evaluation import metrics as M


def rollout_dataset(model, params, dataset, batch_size: int = 8):
    """Run the model over the whole dataset; returns (inits, outputs, targets)
    as numpy [sample, T', C, (F), H, W] arrays (normalized units)."""
    fn = jax.jit(model.apply)
    outs, tars, inits = [], [], []
    for batch in dataset.batches(batch_size):
        const, pres, prog, target = batch
        out = fn(
            params,
            None if const is None else jnp.asarray(const),
            None if pres is None else jnp.asarray(pres),
            jnp.asarray(prog),
        )
        outs.append(np.asarray(out))
        tars.append(target)
        inits.append(prog[:, model.context_size - 1])
    return (
        np.concatenate(inits, 0),
        np.concatenate(outs, 0),
        np.concatenate(tars, 0),
    )


def prognostic_channel_names(data_cfg: dict, n_channels: int) -> list[str]:
    """Channel names in dataset order (reference writes per-variable files,
    `evaluate.py:320-416`): WeatherBench configs expand
    `prognostic_variable_names_and_levels` to e.g. z500/t850; other sources
    fall back to var{i}."""
    spec = data_cfg.get("prognostic_variable_names_and_levels")
    if spec:
        names = []
        for v, levels in spec.items():
            names += [f"{v}{lv}" for lv in levels] if levels else [v]
        if len(names) == n_channels:
            return names
    return [f"var{i}" for i in range(n_channels)]


def denormalize(
    arr: np.ndarray, stats: dict, var_names: list[str], channel_axis: int = 2
) -> np.ndarray:
    """Per-channel de-normalization (reference `evaluate.py:280-296`:
    outputs/targets must be back in PHYSICAL units before metrics).  Falls
    back to the single group statistic when a name is missing (synthetic /
    Navier-Stokes sources normalize the whole prognostic group at once)."""
    out = arr.copy()
    group = next(iter(stats.values())) if len(stats) == 1 else None
    idx = [slice(None)] * arr.ndim
    for i, name in enumerate(var_names):
        st = stats.get(name, group)
        if st is not None:
            idx[channel_axis] = i
            out[tuple(idx)] = out[tuple(idx)] * st.std + st.mean
    return out


def compute_metrics(
    outputs: np.ndarray,
    targets: np.ndarray,
    lats_deg: np.ndarray,
    var_names: list[str],
    out_dir: str,
    climatology: Optional[np.ndarray] = None,
    timedelta_hours: Optional[float] = None,
) -> dict:
    """Lat-weighted RMSE/ACC per variable/lead time + physical soundness.

    outputs/targets: [sample, T, C, H, W].  Writes JSON + netcdf-style npz
    (xarray-free fallback) under out_dir and returns the metrics dict.
    `timedelta_hours` enables the year-long-rollout month-11..12 soundness
    metric when the lead axis reaches 334 days (reference
    `evaluate.py:864-872`).
    """
    os.makedirs(out_dir, exist_ok=True)
    results: dict = {"variables": var_names}
    rmses, accs, fro = {}, {}, {}
    for i, name in enumerate(var_names):
        o = jnp.asarray(outputs[:, :, i])
        t = jnp.asarray(targets[:, :, i])
        rmses[name] = np.asarray(M.weighted_rmse(o, t, lats_deg)).tolist()
        fro[name] = np.asarray(M.frobenius_norm(o, t)).tolist()
        if climatology is not None:
            clim_i = jnp.asarray(climatology[:, :, i])
            accs[name] = np.asarray(M.acc(o, t, clim_i, lats_deg)).tolist()
            # climatology-forecast skill (reference `evaluate.py:823-827`
            # writes rmses_climatology.nc alongside the ACC)
            results.setdefault("rmse_climatology", {})[name] = np.asarray(
                M.weighted_rmse(jnp.broadcast_to(clim_i, t.shape), t, lats_deg)
            ).tolist()
        # physical soundness: zonal-mean RMSEs (global / trade winds / SW)
        results.setdefault("zonal_rmse_global", {})[name] = float(
            M.zonal_mean_rmse(o, t, lats_deg)
        )
        results.setdefault("zonal_rmse_trade_winds", {})[name] = float(
            M.zonal_mean_rmse(o, t, lats_deg, [(-20, -10), (10, 20)])
        )
        results.setdefault("zonal_rmse_south_westerlies", {})[name] = float(
            M.zonal_mean_rmse(o, t, lats_deg, [(-55, -45)])
        )
        if timedelta_hours is not None:
            m1112 = M.rmse_months_11_12(o, t, timedelta_hours)
            if m1112 is not None:
                results.setdefault("rmse_months_11_12", {})[name] = float(m1112)
    results["rmse"] = rmses
    results["frobenius"] = fro
    if accs:
        results["acc"] = accs
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(results, f, indent=1)
    _write_netcdf_or_npz(out_dir, "rmses", rmses, var_names)
    if accs:
        _write_netcdf_or_npz(out_dir, "accs", accs, var_names)
        _write_netcdf_or_npz(out_dir, "rmses_climatology",
                             results["rmse_climatology"], var_names)
    return results


def _write_netcdf_or_npz(out_dir, name, per_var: dict, var_names):
    """Metric curves -> `<name>.nc` (reference `evaluate.py:797-803` writes
    rmses.nc/accs.nc).  Prefers xarray when installed; otherwise the
    first-party scipy netCDF3 writer; npz only if both are unavailable."""
    data = {
        v: (("time",), np.asarray(per_var[v]))
        for v in var_names
        if v in per_var
    }
    try:
        import xarray as xr

        ds = xr.Dataset({v: (dims, arr) for v, (dims, arr) in data.items()})
        ds.to_netcdf(os.path.join(out_dir, f"{name}.nc"))
        return
    except ImportError:
        pass
    try:
        from dlwpbench_tpu.utils import netcdf3

        netcdf3.write_dataset(os.path.join(out_dir, f"{name}.nc"), data)
    except Exception:
        np.savez(os.path.join(out_dir, f"{name}.npz"), **per_var)


def write_forecast_files(out_dir, inits, outputs, targets, var_names, lats, lons):
    """inits/outputs/targets -> netcdf (reference `evaluate.py:306-416`)."""
    os.makedirs(out_dir, exist_ok=True)
    # validate OUTSIDE the try (whose except is the no-xarray npz fallback
    # and must not swallow shape errors): lat-lon only — HEALPix arrays
    # must be remapped before writing, or the dims would be mislabeled
    for arr, tdim in ((inits, False), (outputs, True), (targets, True)):
        want = 5 if tdim else 4  # [S, (T,), C, H, W]
        if arr.ndim != want:
            raise ValueError(
                f"expected {want}-D lat-lon array "
                f"({'with' if tdim else 'no'} time dim), got shape "
                f"{arr.shape}; remap HEALPix output before writing"
            )
    def var_dict(arr, tdim):
        dims = ("sample", "time", "lat", "lon") if tdim else ("sample", "lat", "lon")
        return {
            v: (dims, arr[:, :, i] if tdim else arr[:, i])
            for i, v in enumerate(var_names)
        }

    coords = {"lat": np.asarray(lats), "lon": np.asarray(lons)}
    files = [
        ("inits.nc", var_dict(inits, False)),
        ("outputs.nc", var_dict(outputs, True)),
        ("targets.nc", var_dict(targets, True)),
    ]
    try:
        import xarray as xr

        for fname, data_vars in files:
            xr.Dataset(
                {v: (d, a) for v, (d, a) in data_vars.items()}, coords=coords
            ).to_netcdf(os.path.join(out_dir, fname))
        return
    except ImportError:
        pass
    try:
        from dlwpbench_tpu.utils import netcdf3

        for fname, data_vars in files:
            netcdf3.write_dataset(
                os.path.join(out_dir, fname), data_vars, coords=coords
            )
    except Exception:  # pragma: no cover - scipy is baked into this image
        np.savez(
            os.path.join(out_dir, "forecast.npz"),
            inits=inits,
            outputs=outputs,
            targets=targets,
        )


def plot_rmse_over_time(metric_files: dict[str, dict], var_names, out_path):
    """Overlay RMSE-over-leadtime curves per model (reference
    `evaluate.py:714-764`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(var_names)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3), squeeze=False)
    for j, v in enumerate(var_names):
        ax = axes[0, j]
        for model_name, res in metric_files.items():
            if v in res.get("rmse", {}):
                ax.plot(res["rmse"][v], label=model_name)
        ax.set_title(v)
        ax.set_xlabel("lead time")
        ax.set_ylabel("RMSE")
    axes[0, 0].legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def render_forecast_frames(
    outputs: np.ndarray,
    frames_dir: str,
    targets: Optional[np.ndarray] = None,
    var_name: str = "",
) -> int:
    """Write the reference's per-timestep forecast frames as PNGs.

    outputs (and optionally targets): [T, H, W].  With targets, each frame
    is the reference's 3-panel prediction / ground truth / difference
    layout (`evaluate.py:442-478`: shared output/target color range,
    symmetric bwr difference scale); without, a single panel.  Returns the
    number of frames written.  Pure-matplotlib — testable without ffmpeg.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(frames_dir, exist_ok=True)
    T = outputs.shape[0]
    if targets is not None:
        vmin, vmax = float(np.min(targets)), float(np.max(targets))
        diff = outputs - targets
        diffmax = float(np.abs(diff).max()) or 1.0
    else:
        vmin, vmax = (float(v) for v in np.percentile(outputs, [2, 98]))
    for t in range(T):
        if targets is None:
            fig, ax = plt.subplots(figsize=(4, 2.2))
            ax.imshow(outputs[t], vmin=vmin, vmax=vmax, cmap="RdBu_r",
                      origin="lower")
            ax.set_axis_off()
        else:
            fig, axes = plt.subplots(1, 3, figsize=(12, 3), sharex=True,
                                     sharey=True)
            ext = [-180, 180, -90, 90]
            axes[0].imshow(outputs[t], origin="lower", vmin=vmin, vmax=vmax,
                           extent=ext)
            axes[0].set_title(r"Prediction ($\hat{y}$)")
            im1 = axes[1].imshow(targets[t], origin="lower", vmin=vmin,
                                 vmax=vmax, extent=ext)
            axes[1].set_title(r"Ground truth ($y$)")
            fig.colorbar(im1, ax=axes[1], fraction=0.025)
            im2 = axes[2].imshow(diff[t], origin="lower", vmin=-diffmax,
                                 vmax=diffmax, cmap="bwr", extent=ext)
            axes[2].set_title(r"Difference ($\hat{y}-y$)")
            fig.colorbar(im2, ax=axes[2], fraction=0.025)
            fig.suptitle(f"{var_name}, time step = {t + 1}/{T}")
            fig.tight_layout()
        fig.savefig(os.path.join(frames_dir, f"f{t:04d}.png"), dpi=80)
        plt.close(fig)
    return T


def generate_mp4(
    fields: np.ndarray,
    out_path: str,
    targets: Optional[np.ndarray] = None,
    fps: int = 4,
    var_name: str = "",
) -> bool:
    """Render a [T, H, W] forecast to mp4 (reference `evaluate.py:419-500`:
    matplotlib frames + ffmpeg).  Feature-gated: returns False without
    writing anything when ffmpeg is unavailable in the image."""
    import shutil
    import tempfile

    if shutil.which("ffmpeg") is None:
        return False
    with tempfile.TemporaryDirectory() as td:
        render_forecast_frames(fields, td, targets=targets, var_name=var_name)
        ret = subprocess.run(
            [
                "ffmpeg", "-y", "-loglevel", "quiet", "-framerate", str(fps),
                "-i", os.path.join(td, "f%04d.png"),
                "-pix_fmt", "yuv420p",
                "-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2",
                out_path,
            ],
            check=False,
        )
    return ret.returncode == 0
