#!/usr/bin/env python
"""One-command paper-figure generation from real evaluation artifacts.

    python scripts/paper_figures.py -c outputs/<run> [outputs/<other> ...]
        [--out-dir results/figures] [--var 0]

The reference's `scripts/plot_results.py` (999 LoC) renders its figure
families from HARDCODED result arrays; this CLI produces the same families
from measured artifacts instead:

  - RMSE (+ACC when baselines exist) over lead time, all runs overlaid
  - physical-soundness zonal-band RMSE bars (global / trades / westerlies)
  - long-rollout mean/std drift vs verification (`plot_results.py:318,651`)
  - end-condition state snapshots (`plot_results.py:651`)
  - Hovmoller diagram, zonal FFT amplitude + wavenumber distribution,
    kinetic-energy-style spectrum (`plot_results.py:925`)
  - runtime/memory/TFLOP-s over params come from `scripts/ladder_tables.py`

Each run dir must contain `evaluation/` from `scripts/evaluate.py`
(metrics.json + forecast files).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_eval(run_dir):
    ed = os.path.join(run_dir, "evaluation")
    with open(os.path.join(ed, "metrics.json")) as f:
        metrics = json.load(f)
    arrays = None
    fnpz = os.path.join(ed, "forecast.npz")
    if os.path.exists(fnpz):
        z = np.load(fnpz)
        arrays = {k: z[k] for k in ("inits", "outputs", "targets")}
    else:
        try:  # netcdf path (xarray- and scipy-written files alike)
            from dlwpbench_tpu.utils.netcdf3 import read_dataset

            arrays = {}
            for k in ("inits", "outputs", "targets"):
                data, _ = read_dataset(os.path.join(ed, f"{k}.nc"))
                arrays[k] = np.stack(
                    [data[v] for v in metrics["variables"]], axis=-3
                )
        except Exception:
            arrays = None
    return metrics, arrays


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--configuration-dir-list", nargs="+", required=True)
    ap.add_argument("--out-dir", default="results/figures")
    ap.add_argument("--var", type=int, default=0,
                    help="channel index for the single-variable figures")
    ap.add_argument("--timedelta-hours", type=float, default=6.0)
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (figures never need the chip; the "
                         "spectrum helpers are jax-jitted)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", args.platform)

    from dlwpbench_tpu.evaluation import plots as P
    from dlwpbench_tpu.evaluation.evaluate import plot_rmse_over_time
    from dlwpbench_tpu.grids.latlon import LatLonGrid
    from dlwpbench_tpu.training.losses import zonal_power_spectrum

    os.makedirs(args.out_dir, exist_ok=True)
    runs = {}
    for rd in args.configuration_dir_list:
        name = os.path.basename(os.path.normpath(rd))
        runs[name] = _load_eval(rd)

    metrics_by_run = {n: m for n, (m, _) in runs.items()}
    var_names = next(iter(metrics_by_run.values()))["variables"]
    v = args.var
    vn = var_names[v]
    made = []

    # 1) RMSE(/ACC) over lead time, all runs overlaid
    p = os.path.join(args.out_dir, "rmse_over_time.png")
    plot_rmse_over_time(metrics_by_run, var_names, p)
    made.append(p)

    # 2) physical-soundness zonal-band bars
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    bands = ["zonal_rmse_global", "zonal_rmse_trade_winds",
             "zonal_rmse_south_westerlies"]
    fig, ax = plt.subplots(figsize=(1.2 + 1.6 * len(runs), 3))
    width = 0.8 / len(bands)
    xs = np.arange(len(runs))
    for i, b in enumerate(bands):
        vals = [m.get(b, {}).get(vn, np.nan) for m in metrics_by_run.values()]
        ax.bar(xs + i * width, vals, width,
               label=b.replace("zonal_rmse_", ""))
    ax.set_xticks(xs + width)
    ax.set_xticklabels(list(runs), rotation=20, fontsize=7)
    ax.set_ylabel(f"zonal-band RMSE ({vn})")
    ax.legend(fontsize=7)
    fig.tight_layout()
    p = os.path.join(args.out_dir, "physical_soundness.png")
    fig.savefig(p, dpi=110)
    plt.close(fig)
    made.append(p)

    # 3..7) array-based figures from the first run with forecast arrays
    for name, (m, arrays) in runs.items():
        if arrays is None:
            continue
        out, tar = arrays["outputs"], arrays["targets"]
        grid = LatLonGrid(*out.shape[-2:])

        series = {name: out[0, :, v]}
        p = os.path.join(args.out_dir, f"long_rollout_{name}.png")
        P.long_rollout_mean_std_plot(
            series, tar[0, :, v], p,
            timedelta_hours=args.timedelta_hours, var_name=vn,
        )
        made.append(p)

        last = out.shape[1] - 1
        p = os.path.join(args.out_dir, f"end_conditions_{name}.png")
        P.end_conditions_plot(
            {name: out[0, last, v]}, tar[0, last, v], p,
            day=int(last * args.timedelta_hours / 24), var_name=vn,
        )
        made.append(p)

        p = os.path.join(args.out_dir, f"hovmoller_{name}.png")
        P.hovmoller_plot(
            out[0, :, v, out.shape[-2] // 2], grid.lons, p, var=vn,
        )
        made.append(p)

        # [T, lat, K] zonal power; mid-latitude ring for the line figures
        amp = np.asarray(zonal_power_spectrum(out[0, :, v], grid.lats))
        mid = amp.shape[-2] // 2
        p = os.path.join(args.out_dir, f"zonal_fft_{name}.png")
        P.zonal_fft_amplitude_plot(
            amp[:, mid], p,
            time_indices=(0, out.shape[1] // 2, out.shape[1] - 1), var=vn,
        )
        made.append(p)

        p = os.path.join(args.out_dir, f"wavenumber_dist_{name}.png")
        P.zonal_wavenumber_distribution_plot(amp[:, mid], p, var=vn)
        made.append(p)

        p = os.path.join(args.out_dir, f"ke_spectrum_{name}.png")
        P.kinetic_energy_spectrum_plot(
            {name: amp[:, mid].mean(axis=0),
             "verification": np.asarray(
                 zonal_power_spectrum(tar[0, :, v], grid.lats)
             )[:, mid].mean(axis=0)},
            p,
        )
        made.append(p)

        p = os.path.join(args.out_dir, f"rmse_map_{name}.png")
        P.rmse_per_gridpoint_plot(out[:, :, v], tar[:, :, v], p, title=name)
        made.append(p)

    for p in made:
        print(f"-> {p}")


if __name__ == "__main__":
    main()
