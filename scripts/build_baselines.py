#!/usr/bin/env python
"""Build persistence + monthly-climatology baseline forecasts
(reference `scripts/build_baselines.py`, `scripts/climatology.py`).

Runs against a trained run's test split so the baselines share the exact
forecast protocol, writes them under `outputs/<baseline>/evaluation/` in the
same format as model evaluations (so `scripts/evaluate.py`'s comparison plot
and the ACC metric can consume them).

    python scripts/build_baselines.py -c outputs/<run> [--sequence-length 17]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--configuration-dir", required=True)
    ap.add_argument("--sequence-length", type=int, default=17)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu for relay-less runs; "
                         "the image clobbers JAX_PLATFORMS)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import dlwpbench_tpu

    dlwpbench_tpu.enable_compile_cache()
    from dlwpbench_tpu.data.sources import build_datasets
    from dlwpbench_tpu.evaluation import evaluate as E
    from dlwpbench_tpu.evaluation.baselines import persistence_forecast
    from dlwpbench_tpu.training.config import load_saved_config

    cfg = load_saved_config(args.configuration_dir)
    ctx = int(cfg.model.context_size)
    cfg.testing["sequence_length"] = args.sequence_length
    train_ds, _, test_ds, stats = build_datasets(
        cfg.data, cfg.training, cfg.validation, cfg.get("testing"), ctx
    )
    test_ds.sequence_length = args.sequence_length
    if len(test_ds) == 0:
        raise ValueError("test split has no windows; reduce --sequence-length")

    inits, targets = [], []
    for _, _, prog, tar in test_ds.batches(8):
        inits.append(prog[:, ctx - 1])
        targets.append(tar)
    inits = np.concatenate(inits)
    targets = np.concatenate(targets)
    n_steps = targets.shape[1]

    var_names = E.prognostic_channel_names(cfg.data, targets.shape[2])
    # baselines and metrics live in PHYSICAL units like model evaluations
    # (reference works denormalized, `evaluate.py:280-296`)
    if stats and bool(cfg.data.get("normalize", True)):
        inits = E.denormalize(inits, stats, var_names, channel_axis=1)
        targets = E.denormalize(targets, stats, var_names)

    # persistence
    pers = persistence_forecast(inits, n_steps)
    # climatology: MONTHLY-stratified mean of the train split when the
    # source carries a real calendar (reference `build_baselines.py:35-74`,
    # looked up at each forecast valid time); synthetic/NS splits use the
    # overall mean (the climatology of a stationary series)
    denorm = stats and bool(cfg.data.get("normalize", True))
    if getattr(train_ds, "times", None) is not None and test_ds.times is not None:
        from dlwpbench_tpu.evaluation.baselines import (
            climatology_forecast,
            monthly_climatology,
        )

        fields = train_ds.prognostic
        if denorm:
            fields = E.denormalize(fields, stats, var_names, channel_axis=1)
        tr_months = train_ds.times.astype("datetime64[M]").astype(int) % 12 + 1
        clim_table = monthly_climatology(fields, tr_months)
        te_months = (
            test_ds.times.astype("datetime64[M]").astype(int) % 12 + 1
        )
        valid = np.stack(
            [
                te_months[test_ds.target_frame_indices(i)]
                for i in range(len(test_ds))
            ]
        )
        clim = climatology_forecast(clim_table, valid)
    else:
        clim_state = np.zeros_like(inits[0])
        count = 0
        for _, _, prog, _ in train_ds.batches(8):
            clim_state = clim_state + prog.mean(axis=(0, 1)) * prog.shape[0]
            count += prog.shape[0]
        clim_state /= max(count, 1)
        if denorm:
            clim_state = E.denormalize(
                clim_state[None], stats, var_names, channel_axis=1
            )[0]
        clim = np.broadcast_to(
            clim_state[None, None],
            (inits.shape[0], n_steps, *clim_state.shape),
        ).copy()

    # HEALPix runs: remap to lat-lon before metrics, exactly like model
    # evaluation (scripts/evaluate.py; previously these were skipped and
    # the np.savez below crashed on the never-created directory)
    if targets.ndim == 6:
        from dlwpbench_tpu.grids.remap import HEALPixRemap

        nside = targets.shape[-1]
        rm = HEALPixRemap(
            int(cfg.data.get("height", 32)), int(cfg.data.get("width", 64)),
            nside,
        )
        pers = np.asarray(rm.hpx2ll(pers))
        clim = np.asarray(rm.hpx2ll(clim))
        targets = np.asarray(rm.hpx2ll(targets))

    from dlwpbench_tpu.grids.latlon import LatLonGrid

    lats = LatLonGrid(*targets.shape[-2:]).lats

    results = {}
    for name, fc in [("persistence", pers), ("climatology", clim)]:
        out_dir = os.path.join("outputs", name, "evaluation")
        results[name] = E.compute_metrics(fc, targets, lats, var_names, out_dir)
        print(
            f"{name}: RMSE(first var) per lead time =",
            np.round(results[name]["rmse"][var_names[0]], 4).tolist(),
        )
    # climatology forecast file for ACC computations (evaluate.py:806-821)
    clim_dir = os.path.join("outputs", "climatology", "evaluation")
    os.makedirs(clim_dir, exist_ok=True)
    np.savez(os.path.join(clim_dir, "outputs.npz"), outputs=clim)
    print("-> outputs/{persistence,climatology}/evaluation/")


if __name__ == "__main__":
    main()
