#!/usr/bin/env python
"""Analytic multi-chip scaling model for the flagship families.

Real multi-chip hardware is not reachable from this rig (one v5e chip via
a relay), so the BASELINE's >=80%-efficiency-on-a-v5p-slice target cannot
be *measured* here.  This model is the honest substitute the round-1
VERDICT asked for: it combines MEASURED single-chip step times
(results/ladder.json) with an analytic communication model of each
family's distributed design (parallel/), on published TPU link numbers,
to predict per-strategy scaling efficiency.  The virtual-CPU-mesh numbers
(results/scaling_virtual_mesh.json) check functional correctness only.

Assumptions (documented, not measured):
- v5e: 197 bf16 TFLOP/s, 819 GB/s HBM, ~200 GB/s aggregate ICI per chip;
- v5p: 459 bf16 TFLOP/s, 2765 GB/s HBM, ~600 GB/s aggregate ICI per chip;
- collectives overlap nothing (worst case); latency ignored (messages are
  MB-scale at these shapes, bandwidth-dominated).

    python scripts/scaling_model.py
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHIPS = {
    "v5e": {"ici_gbps": 200e9},
    "v5p": {"ici_gbps": 600e9, "flops_ratio_vs_v5e": 459 / 197},
}


def model_families(H, W, C_act, seq):
    """Per-family bytes moved over ICI per *training step* on P chips.

    Returns {family: fn(P) -> bytes}; 4 bytes/element fp32 (halve for bf16).
    fwd + bwd double every exchange (the adjoint of a halo exchange /
    all-to-all is the mirrored exchange).
    """
    B = 1  # per-chip batch after DP; spatial decomposition moves the rest

    def unet(P):
        # lat-domain decomposition (parallel/mesh.py shard_batch): one
        # 1-row halo per conv layer, ~12 conv layers over 3 levels (rows
        # shrink 2x per level), fwd+bwd, seq steps.
        rows = 0
        for level, n in ((0, 4), (1, 4), (2, 4)):
            rows += n * (W >> level) * C_act * (1 << level)  # C doubles as W halves
        return seq * 2 * 2 * B * rows * 4  # 2 dirs x fwd+bwd

    def sfno(P):
        # distributed SHT (parallel/sht_dist.py): 2 all-to-all transposes
        # per spherical conv, 4 layers, each moving the full activation
        # once ((P-1)/P of it crosses chips), fwd+bwd.
        act = B * H * W * C_act * 4
        return seq * 2 * (2 * 4) * act * (P - 1) / max(P, 1)

    def graphcast(P):
        # nodewise partition (parallel/graphcast_dist.py): boundary src
        # features per processor layer; icosphere cut fraction ~ 2/sqrt(V/P)
        # per chip -> total boundary ~ 2*sqrt(V*P).
        V = 4 ** 6 * 10 + 2  # mesh_level 6 multimesh vertices ~ 41k
        D = 512
        import math

        boundary = 2.0 * math.sqrt(V * P)
        return seq * 2 * 16 * boundary * D * 4

    def swin_ring(P):
        # ring (context-parallel) attention (parallel/ring_attention.py):
        # per attention call each chip sends its k+v chunk (P-1) times
        # (ppermute rotations); the backward's ppermute adjoints mirror
        # every rotation -> 2x.  8 attention blocks (depths 4+4), global
        # window N = H*W, head count folded into C_act.
        N = H * W
        per_call = 2 * B * N / max(P, 1) * C_act * 4  # k+v chunk bytes
        return seq * 2 * 8 * per_call * (P - 1)

    return {
        "unet": unet, "sfno2d": sfno, "graphcast": graphcast,
        "swin_ring": swin_ring,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ladder", default="results/ladder.json")
    ap.add_argument("--out", default="results/scaling_model.json")
    args = ap.parse_args(argv)

    with open(args.ladder) as f:
        ladder = json.load(f)

    # measured single-chip step times at the 8M rung (mid-ladder, 32x64)
    measured = {}
    for fam, key in (
        ("unet", "unet"), ("sfno2d", "sfno2d"),
        ("graphcast", "graphcast"), ("swin_ring", "swin"),
    ):
        e = ladder.get(f"{key}@8m@32x64")
        if e and "step_s" in e:
            measured[fam] = e["step_s"]

    results = {"_assumptions": __doc__.strip().split("Assumptions")[1][:400]}
    for chip, spec in CHIPS.items():
        ici = spec["ici_gbps"]
        scale_t = 1.0 / spec.get("flops_ratio_vs_v5e", 1.0)
        for grid_name, (H, W) in (("5.625deg", (32, 64)),
                                  ("1.0deg", (180, 360))):
            area_ratio = (H * W) / (32 * 64)
            fams = model_families(H, W, C_act=256, seq=15)
            for fam, comm_bytes in fams.items():
                if fam not in measured:
                    continue
                if fam == "swin_ring":
                    # global-window attention is O(N^2): scale the (assumed
                    # ~50/50 at 32x64) attention/mlp split super/linearly
                    t1 = measured[fam] * scale_t * (
                        0.5 * area_ratio**2 + 0.5 * area_ratio
                    )
                else:
                    t1 = measured[fam] * area_ratio * scale_t
                rows = {}
                for P in (1, 2, 4, 8, 16, 32, 64):
                    t_comp = t1 / P
                    t_comm = comm_bytes(P) / ici if P > 1 else 0.0
                    eff = t_comp / (t_comp + t_comm)
                    rows[P] = round(eff, 3)
                results[f"{chip}:{grid_name}:{fam}"] = {
                    "single_chip_step_s": round(t1, 4),
                    "efficiency_by_chips": rows,
                }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {args.out}")
    for k, v in results.items():
        if k.startswith("_"):
            continue
        print(f"{k:30s} {v['efficiency_by_chips']}")


if __name__ == "__main__":
    main()
