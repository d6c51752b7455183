#!/usr/bin/env python
"""Serve an AOT-exported forecast artifact over a dataset — no model code.

    python scripts/serve.py -a model.stablehlo -c outputs/<run> \
        [--out-dir <run>/serving] [--platform cpu] [--video]

The production-inference counterpart of `scripts/evaluate.py`: the compute
comes entirely from the StableHLO artifact (weights baked in at export,
`scripts/export_model.py`), while the run dir supplies the data config so
windows, normalization statistics, and the biweekly init protocol match
training.  Writes the same forecast files/metrics as the evaluator and
reports steady-state serving throughput.

Replaces the reference's deploy story (unpickle checkpoint into the model
class at `evaluate.py:140-149`) with a code-free artifact.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def serve_dataset(run, meta, test_ds, batch_size):
    """Roll the artifact over the dataset; returns (inits, outputs, targets)
    plus steady-state seconds per batch."""
    import jax

    shapes = meta["shapes"]
    B = int(shapes["prog"][0])
    if batch_size and batch_size != B:
        raise ValueError(
            f"artifact is shape-locked to batch {B}; re-export with "
            f"--batch-size {batch_size}"
        )
    outs, tars, inits, times = [], [], [], []
    ctx = int(meta.get("context_size", 1))
    for batch in test_ds.batches(B):
        const, pres, prog, target = batch
        if prog.shape[0] != B:  # shape-locked artifact: skip ragged tail
            continue
        t0 = time.perf_counter()
        out = run(
            None if shapes["const"] is None else np.asarray(const, np.float32),
            None if shapes["pres"] is None else np.asarray(pres, np.float32),
            np.asarray(prog, np.float32),
        )
        out = np.asarray(jax.block_until_ready(out))
        times.append(time.perf_counter() - t0)
        outs.append(out)
        tars.append(target)
        inits.append(prog[:, ctx - 1])
    if not outs:
        raise ValueError(
            f"no full batches of {B} windows in the test split; re-export "
            "with a smaller --batch-size"
        )
    steady = float(np.median(times[1:])) if len(times) > 1 else times[0]
    return (
        np.concatenate(inits, 0),
        np.concatenate(outs, 0),
        np.concatenate(tars, 0),
        steady,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-a", "--artifact", required=True)
    ap.add_argument("-c", "--run-dir", required=True,
                    help="run dir supplying the data config + stats")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="must match the exported batch (checked)")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu for relay-less runs)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import dlwpbench_tpu

    dlwpbench_tpu.enable_compile_cache()
    from dlwpbench_tpu.data.sources import build_datasets
    from dlwpbench_tpu.evaluation import evaluate as E
    from dlwpbench_tpu.grids.latlon import LatLonGrid
    from dlwpbench_tpu.grids.remap import HEALPixRemap
    from dlwpbench_tpu.training.config import load_saved_config
    from dlwpbench_tpu.utils.export import load_exported

    run, meta = load_exported(args.artifact)
    cfg = load_saved_config(args.run_dir)
    seq = int(meta["shapes"]["prog"][1])
    cfg.testing["sequence_length"] = seq

    _, _, test_ds, stats = build_datasets(
        cfg.data, cfg.training, cfg.validation, cfg.get("testing"),
        int(meta.get("context_size", 1)),
    )
    test_ds.sequence_length = seq

    inits, outputs, targets, steady = serve_dataset(
        run, meta, test_ds, args.batch_size
    )
    B, T = outputs.shape[:2]
    npts = int(np.prod(outputs.shape[-2:])) * (
        12 if outputs.ndim == 6 else 1
    )
    gps = B * T * npts / steady
    print(f"Serve: {outputs.shape}  steady {steady*1e3:.1f} ms/batch "
          f"({gps:,.0f} output gridpoints/s)")

    var_names = E.prognostic_channel_names(cfg.data, outputs.shape[2])
    if stats and bool(cfg.data.get("normalize", True)):
        outputs = E.denormalize(outputs, stats, var_names)
        targets = E.denormalize(targets, stats, var_names)
        inits = E.denormalize(inits, stats, var_names, channel_axis=1)

    if outputs.ndim == 6:  # HEALPix -> lat-lon like the evaluator
        rm = HEALPixRemap(
            int(cfg.data.get("height", 32)), int(cfg.data.get("width", 64)),
            outputs.shape[-1],
        )
        outputs = np.asarray(rm.hpx2ll(outputs))
        targets = np.asarray(rm.hpx2ll(targets))
        inits = np.asarray(rm.hpx2ll(inits))

    grid = LatLonGrid(*outputs.shape[-2:])
    out_dir = args.out_dir or os.path.join(args.run_dir, "serving")
    E.write_forecast_files(
        out_dir, inits, outputs, targets, var_names, grid.lats, grid.lons
    )
    results = E.compute_metrics(
        outputs, targets, grid.lats, var_names, out_dir,
        timedelta_hours=float(
            cfg.data.get("timedelta_hours", cfg.data.get("timedelta", 6))
        ),
    )
    with open(os.path.join(out_dir, "serving.json"), "w") as f:
        json.dump(
            {"steady_s_per_batch": steady, "gridpoints_per_s": gps,
             "artifact": os.path.abspath(args.artifact)}, f, indent=1,
        )
    print("RMSE (first var, per lead time):",
          np.round(results["rmse"][var_names[0]], 4).tolist())
    print(f"-> {out_dir}")


if __name__ == "__main__":
    main()
