#!/usr/bin/env python
"""Evaluation CLI (reference `scripts/evaluate.py:1096-1125`):

    python scripts/evaluate.py -c outputs/<model_name> [outputs/<other> ...]
        [--sequence-length 17] [--batch-size 8] [--video]

For each run directory: restores the saved config + best checkpoint, rolls
out over the test split, de-normalizes, remaps HEALPix output to lat-lon,
writes forecast netcdf files + metrics, and renders comparison plots.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def evaluate_run(run_dir: str, sequence_length: int, batch_size: int, video: bool):
    import dlwpbench_tpu

    dlwpbench_tpu.enable_compile_cache()
    from dlwpbench_tpu.data.sources import build_datasets
    from dlwpbench_tpu.evaluation import evaluate as E
    from dlwpbench_tpu.grids.remap import HEALPixRemap
    from dlwpbench_tpu.models import registry
    from dlwpbench_tpu.training.config import load_saved_config
    from dlwpbench_tpu.training.trainer import Trainer, load_checkpoint

    import dlwpbench_tpu.models  # noqa: F401

    cfg = load_saved_config(run_dir)
    cfg.testing["sequence_length"] = sequence_length
    model = registry.build_model(cfg.model)
    ctx = int(cfg.model.context_size)

    _, _, test_ds, stats = build_datasets(
        cfg.data, cfg.training, cfg.validation, cfg.get("testing"), ctx
    )
    test_ds.sequence_length = sequence_length
    if len(test_ds) == 0:
        raise ValueError(
            f"test split has no windows of length {sequence_length}; "
            "reduce --sequence-length or enlarge the test period"
        )

    # Diffusion runs evaluate with the EMA weights (reference
    # `evaluate.py:229-241` restores the EMA state dict for the
    # PDE-Refiner track); the template TrainState must carry an
    # ema_params slot for load_checkpoint to restore it.
    training_type = str(cfg.training.get("type", "regular"))
    trainer = Trainer(model, epochs=1, training_type=training_type)
    state = trainer.init(next(iter(test_ds.batches(1))))
    state = load_checkpoint(run_dir, cfg.model.name, state, kind="best")
    eval_params = (
        state.ema_params if state.ema_params is not None else state.params
    )
    which = "EMA" if state.ema_params is not None else "raw"
    print(f"Restored {cfg.model.name} (epoch {state.epoch}, {which} weights)")

    inits, outputs, targets = E.rollout_dataset(
        model, eval_params, test_ds, batch_size
    )
    print(f"Rollout: {outputs.shape}")

    var_names = E.prognostic_channel_names(cfg.data, outputs.shape[2])

    # back to PHYSICAL units before remap/metrics/files (reference
    # `evaluate.py:280-296`; rollout_dataset returns normalized units)
    if stats and bool(cfg.data.get("normalize", True)):
        outputs = E.denormalize(outputs, stats, var_names)
        targets = E.denormalize(targets, stats, var_names)
        inits = E.denormalize(inits, stats, var_names, channel_axis=1)

    # HEALPix -> lat-lon before metrics (`evaluate.py:298-304`)
    if outputs.ndim == 6:
        nside = outputs.shape[-1]
        nlat = int(cfg.data.get("height", 32))
        nlon = int(cfg.data.get("width", 64))
        rm = HEALPixRemap(nlat, nlon, nside)
        outputs = np.asarray(rm.hpx2ll(outputs))
        targets = np.asarray(rm.hpx2ll(targets))
        inits = np.asarray(rm.hpx2ll(inits))

    from dlwpbench_tpu.grids.latlon import LatLonGrid

    grid = LatLonGrid(*outputs.shape[-2:])
    lats, lons = grid.lats, grid.lons

    out_dir = os.path.join(run_dir, "evaluation")
    E.write_forecast_files(out_dir, inits, outputs, targets, var_names, lats, lons)

    # ACC needs the climatology forecast (reference `evaluate.py:806-821`
    # reads outputs/climatology/evaluation/); produced by build_baselines.py.
    clim = None
    clim_path = os.path.join("outputs", "climatology", "evaluation", "outputs.npz")
    if os.path.exists(clim_path):
        clim_arr = np.load(clim_path)["outputs"]
        if (
            clim_arr.shape[1] >= outputs.shape[1]
            and clim_arr.shape[0] >= outputs.shape[0]
            # a stale climatology from a different run geometry must not
            # feed ACC (outputs/climatology is shared across runs)
            and clim_arr.shape[2:] == outputs.shape[2:]
        ):
            clim = clim_arr[: outputs.shape[0], : outputs.shape[1]]
        else:
            print(
                f"skipping climatology {clim_arr.shape} (mismatch vs "
                f"forecasts {outputs.shape}); ACC not computed"
            )
    results = E.compute_metrics(
        outputs, targets, lats, var_names, out_dir, climatology=clim,
        # lead-step length: explicit timedelta_hours wins (daily-stored
        # trees use timedelta as a step STRIDE, e.g. configs/data/full_*),
        # else the 6-hourly WeatherBench reading of `timedelta`.
        timedelta_hours=float(
            cfg.data.get("timedelta_hours", cfg.data.get("timedelta", 6))
        ),
    )
    print("RMSE (first var, per lead time):",
          np.round(results["rmse"][var_names[0]], 4).tolist())

    if video:
        ok = E.generate_mp4(
            outputs[0, :, 0], os.path.join(out_dir, "forecast.mp4"),
            targets=targets[0, :, 0], var_name=var_names[0],
        )
        print("video:", "written" if ok else "ffmpeg unavailable, skipped")
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--configuration-dir-list", nargs="+", required=True)
    ap.add_argument("--sequence-length", type=int, default=17)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--video", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu for relay-less runs; "
                         "the image clobbers JAX_PLATFORMS)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    all_results = {}
    for run_dir in args.configuration_dir_list:
        name = os.path.basename(os.path.normpath(run_dir))
        all_results[name] = evaluate_run(
            run_dir, args.sequence_length, args.batch_size, args.video
        )

    if len(all_results) >= 1:
        from dlwpbench_tpu.evaluation.evaluate import plot_rmse_over_time

        var_names = all_results[next(iter(all_results))]["variables"]
        out = os.path.join("outputs", "rmse_over_time.png")
        os.makedirs("outputs", exist_ok=True)
        plot_rmse_over_time(all_results, var_names, out)
        print(f"Comparison plot -> {out}")


if __name__ == "__main__":
    main()
