#!/usr/bin/env python
"""Backfill honest FLOP accounting for the scatter-free graph families.

The one-hot incidence-matmul movement (ops/graph_ops.py) *introduces*
FLOPs that XLA's cost model counts, so `achieved_tflops` for mgn/graphcast
entries overstates algorithmic efficiency (VERDICT r3 weak #5).  This
script re-lowers each recorded graph-family config with reference
edge-list movement (`movement_impl="edge_list"` — the gather/segment_sum
semantics DGL executes, reference `gnn_layers/utils.py:96-235`) on the
host CPU backend and writes `algorithmic_flops_per_step` +
`algorithmic_tflops` alongside the executed-program numbers in
`results/ladder.json` and `results/benchmark_training.json`.  Wall-clock
figures are untouched — they always describe the executed program.

    python scripts/backfill_graph_flops.py [--platform cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

GRAPH_FAMILIES = ("mgn", "graphcast")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--ladder", default="results/ladder.json")
    ap.add_argument("--training", default="results/benchmark_training.json")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dlwpbench_tpu

    dlwpbench_tpu.enable_compile_cache()
    from benchmark_ladder import build, step_flops
    from benchmark_models import model_zoo

    cpu = jax.local_devices(backend="cpu")[0]

    # --- ladder entries (batch/seq/grid recorded per entry) ---
    with open(args.ladder) as f:
        ladder = json.load(f)
    for key, e in sorted(ladder.items()):
        if not isinstance(e, dict) or e.get("family") not in GRAPH_FAMILIES:
            continue
        if "error" in e or not e.get("step_s"):
            continue
        if e.get("algorithmic_flops_per_step") and not args.force:
            continue
        g = e["grid"]
        if g.startswith("hpx"):
            ns = int(g[3:])
            sp = (12, ns, ns)
        else:
            h, w = (int(x) for x in g.split("x"))
            ns, sp = None, (h, w)
        B, T, Cc, Cp, Cq = e.get("batch", 1), e.get("seq", 15), 4, 1, 8
        sh_np = tuple(
            np.zeros((B, t, c, *sp), np.float32)
            for t, c in ((1, Cc), (T, Cp), (T, Cq), (T - 1, Cq))
        )
        cdt = "bfloat16" if key.endswith("@bf16") else None
        try:
            with jax.default_device(cpu):
                model = build(e["family"], e["width"], sp[-2], sp[-1],
                              Cc, Cp, Cq, ns)
            model = model.clone(movement_impl="edge_list")
            trips = T - model.context_size
            f = step_flops(model, sh_np, cpu, cdt, trips)
        except Exception as exc:
            print(f"{key}: FAILED {type(exc).__name__}: {exc}", flush=True)
            continue
        if f:
            e["algorithmic_flops_per_step"] = f
            e["algorithmic_tflops"] = round(f / e["step_s"] / 1e12, 3)
            over = e["flops_per_step"] / f if e.get("flops_per_step") else 0
            print(f"{key}: algorithmic {f/1e9:.1f} GFLOP/step "
                  f"({over:.1f}x counted by the one-hot program) -> "
                  f"{e['algorithmic_tflops']:.3f} TFLOP/s", flush=True)
            with open(args.ladder, "w") as fh:
                json.dump(ladder, fh, indent=1, sort_keys=True)

    # --- training matrix (fixed batch/seq from the file header) ---
    with open(args.training) as f:
        tr = json.load(f)
    B, T = tr["batch"], tr["seq"]
    H, W, Cc, Cp, Cq = 32, 64, 4, 1, 8
    zoo = model_zoo(B, H, W, Cc, Cp, Cq)
    sh_np = tuple(
        np.zeros((B, t, c, H, W), np.float32)
        for t, c in ((1, Cc), (T, Cp), (T, Cq), (T - 1, Cq))
    )
    for name in GRAPH_FAMILIES:
        e = tr["results"].get(name)
        if not e or "error" in e or not e.get("train_step_s"):
            continue
        if e.get("algorithmic_flops_per_step") and not args.force:
            continue
        model = zoo[name].clone(movement_impl="edge_list")
        trips = T - model.context_size
        try:
            f = step_flops(model, sh_np, cpu, None, trips)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: {exc}", flush=True)
            continue
        if f:
            e["algorithmic_flops_per_step"] = f
            e["algorithmic_tflops"] = round(f / e["train_step_s"] / 1e12, 3)
            over = e["flops_per_step"] / f if e.get("flops_per_step") else 0
            print(f"benchmark_training/{name}: algorithmic {f/1e9:.1f} GFLOP "
                  f"({over:.1f}x counted) -> "
                  f"{e['algorithmic_tflops']:.3f} TFLOP/s", flush=True)
            with open(args.training, "w") as fh:
                json.dump(tr, fh, indent=1)
    print("done")


if __name__ == "__main__":
    main()
