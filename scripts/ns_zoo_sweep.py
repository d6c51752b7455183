#!/usr/bin/env python
"""Train + evaluate every remaining model family on the Navier-Stokes track.

The synthetic NS benchmark (BASELINE configs[0]; solver `data/ns2d.py`)
generates its own data on device, so it exercises each architecture's full
train->checkpoint->evaluate chain without external datasets.  ConvLSTM,
UNet, DISTANA, and the diffusion track already have committed results
(`results/ns_*`); this sweep covers the spectral, attention, and graph
families and snapshots {train_tail.log, eval.log, metrics.json,
persistence_metrics.json} to `results/ns_<family>/` in the same format.

    python scripts/ns_zoo_sweep.py [--families fno,sfno,...] [--epochs 25]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAMILIES = {
    # family -> (model config group, extra overrides)
    "fno": ("fno", []),
    "sfno": ("sfno", []),
    "fourcastnet": ("fourcastnet", []),
    "swin": ("swintransformer", []),
    # 64x64 NS doubles Pangu's token count 8x vs 5.625 deg; batch 8 keeps
    # the remat attention temporaries inside HBM (batch 16 OOMs at 16 GB)
    "pangu": ("panguweather", ["training.batch_size=8"]),
    "mgn": ("meshgraphnet", []),
    "modernunet": ("modernunet", []),
    "fcnv2": ("fourcastnetv2", []),
    # PDE-Refiner diffusion track: v-prediction training (training=diffusion)
    # needs sequence_length == context_size + 1 = 3; eval runs the full DDPM
    # refinement loop per rollout step (model __call__, posterior-mean
    # sampler per the track config).  The 80M denoiser wants more data and
    # epochs than the deterministic families (and sparse checkpointing —
    # its 1.3 GB state would otherwise dominate wall time on the relay).
    "diffusion": ("diffusion_modernunet", [
        "training=diffusion",
        "training.sequence_length=3",
        "validation.sequence_length=3",
        "data.n_trajectories=64",
        "training.epochs=250",
        "training.checkpoint_every=25",
    ]),
    # the WeatherBench-scale default (512 hidden x 16 layers) is oversized
    # for the 64x64 single-channel NS track; match the other families' scale
    "graphcast": ("graphcast", ["model.hidden_dim=128",
                                "model.processor_layers=6"]),
}

COMMON = [
    "data=navier_stokes",
    "training.epochs={epochs}",
    "training.batch_size=16",
    "training.sequence_length=4",
    "validation.sequence_length=4",
    "testing.sequence_length=8",
]


def run(cmd, log_path=None):
    print("+", " ".join(cmd), flush=True)
    res = subprocess.run(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    if log_path:
        with open(log_path, "w") as f:
            f.write(res.stdout)
    if res.returncode != 0:
        print(res.stdout[-4000:])
        raise RuntimeError(f"{cmd} failed rc={res.returncode}")
    return res.stdout


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--seq-eval", type=int, default=8)
    args = ap.parse_args(argv)

    py = sys.executable
    for fam in args.families.split(","):
        group, extra = FAMILIES[fam]
        name = f"ns_{fam}"
        res_dir = os.path.join(REPO, "results", name)
        os.makedirs(res_dir, exist_ok=True)

        overrides = [f"model={group}", f"model.name={name}"] + [
            o.format(epochs=args.epochs) for o in COMMON
        ] + extra
        out = run([py, "scripts/train.py"] + overrides)
        tail = "\n".join(out.strip().splitlines()[-12:])
        with open(os.path.join(res_dir, "train_tail.log"), "w") as f:
            f.write(tail + "\n")

        run_dir = os.path.join(REPO, "outputs", name)
        out = run(
            [py, "scripts/build_baselines.py", "-c", run_dir,
             "--sequence-length", str(args.seq_eval)],
        )
        out2 = run(
            [py, "scripts/evaluate.py", "-c", run_dir,
             "--sequence-length", str(args.seq_eval), "--batch-size", "8"],
        )
        with open(os.path.join(res_dir, "eval.log"), "w") as f:
            f.write(out + "\n" + out2)

        for src, dst in [
            (os.path.join(run_dir, "evaluation", "metrics.json"),
             os.path.join(res_dir, "metrics.json")),
            (os.path.join(REPO, "outputs", "persistence", "evaluation",
                          "metrics.json"),
             os.path.join(res_dir, "persistence_metrics.json")),
        ]:
            if os.path.exists(src):
                shutil.copy(src, dst)

        # one-line skill check for the sweep log
        try:
            with open(os.path.join(res_dir, "metrics.json")) as f:
                m = json.load(f)
            with open(os.path.join(res_dir, "persistence_metrics.json")) as f:
                p = json.load(f)
            v = sorted(m["rmse"])[0]
            mean_m = sum(m["rmse"][v]) / len(m["rmse"][v])
            mean_p = sum(p["rmse"][v]) / len(p["rmse"][v])
            print(f"[{fam}] mean RMSE {mean_m:.4f} vs persistence "
                  f"{mean_p:.4f} -> {'BEATS' if mean_m < mean_p else 'DOES NOT BEAT'}",
                  flush=True)
        except Exception as e:  # metrics format drift should not kill the sweep
            print(f"[{fam}] skill summary unavailable: {e}", flush=True)


if __name__ == "__main__":
    main()
