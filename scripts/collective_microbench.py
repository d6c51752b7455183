#!/usr/bin/env python
"""Validate the analytic scaling model's communication terms (VERDICT r3).

Two checks, both runnable on the 8-device virtual CPU mesh (no multi-chip
hardware needed):

1. **HLO byte audit** — compile the distributed spherical-conv fwd+bwd
   (the SFNO hot layer, `parallel/spectral_dist.py`) over a P-device mesh
   and sum the bytes of every collective instruction in the optimized HLO.
   The analytic model (scripts/scaling_model.py) claims each layer moves
   `2 transposes x activation x (P-1)/P` per direction; the audit checks
   that against what XLA actually emits, catching any modeling drift
   (extra all_gathers from bad shardings, double-moved buffers, ...).

2. **Timing fit** — time `all_to_all` on the virtual mesh across payload
   sizes and fit time = a + bytes/bw.  The virtual mesh's absolute
   bandwidth is meaningless (it is memcpy through host RAM), but the fit
   validates the *form* of the comm term (bandwidth-proportional,
   latency-negligible at MB payloads) that the model assumes for ICI.

Writes `results/collective_microbench.json`.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/collective_microbench.py --platform cpu
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "c64": 8, "c128": 16,
    "s32": 4, "u32": 4, "s64": 8, "u64": 8, "s8": 1, "u8": 1, "pred": 1,
}

_KINDS = ("all-to-all", "all-reduce", "all-gather", "reduce-scatter",
          "collective-permute")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def hlo_collective_bytes(hlo_text: str) -> dict:
    """Sum result-shape bytes per collective kind in an HLO module.

    Handles both scalar results (`f32[8,16] all-to-all(...)`) and the
    variadic tuple form the CPU backend emits for shard_map all_to_alls
    (`(c64[...], c64[...], ...) all-to-all(...)`) by summing every shape
    on the definition's LHS.  `-start`/`-done` async pairs appear once
    (the `-done` carries no shape of its own).
    """
    out: dict[str, int] = {}
    for line in hlo_text.splitlines():
        if " = " not in line:
            continue
        lhs_rhs = line.split(" = ", 1)[1]
        kind = next(
            (k for k in _KINDS
             if re.search(rf"\s{k}(-start)?\(", lhs_rhs)), None
        )
        if kind is None:
            continue
        result = re.split(rf"\s{kind}(?:-start)?\(", lhs_rhs, 1)[0]
        nbytes = 0
        for dt, dims in _SHAPE_RE.findall(result):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        out[kind] = out.get(kind, 0) + nbytes
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--nlat", type=int, default=32)
    ap.add_argument("--nlon", type=int, default=64)
    ap.add_argument("--out", default="results/collective_microbench.json")
    args = ap.parse_args(argv)

    if args.platform:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )
        import jax

        jax.config.update("jax_platforms", args.platform)
    else:
        import jax

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dlwpbench_tpu.ops.sht import sht_tables
    from dlwpbench_tpu.parallel.mesh import make_mesh
    from dlwpbench_tpu.parallel.spectral_dist import make_dist_spherical_conv

    P_ = args.devices
    mesh = make_mesh(P_, data=1, x=P_)
    C, nlat, nlon = args.channels, args.nlat, args.nlon
    t = sht_tables(nlat, nlon, grid="equiangular")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, C, nlat, nlon)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((C, C, t.lmax, 2)) @ np.array([1, 1j]),
        jnp.complex64,
    )
    xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "x", None)))

    results = {"devices": P_, "channels": C, "grid": f"{nlat}x{nlon}"}

    # ---- 1. HLO byte audit: fwd+bwd of one spherical-conv layer ----
    conv = make_dist_spherical_conv(mesh, t, ndim=4)
    loss = lambda a, wc: jnp.sum(conv(a, wc) ** 2)
    compiled = jax.jit(jax.grad(loss)).lower(xs, w).compile()
    hlo = compiled.as_text()
    audit = hlo_collective_bytes(hlo)

    # analytic claim (scaling_model.py sfno term, per layer fwd+bwd):
    # 4 transposes (fwd sht, inv sht, and their adjoints) each carrying the
    # full complex spectrum [C, nlat, mmax~nlon/2] at 8 B/elem == the real
    # activation's 4 B * H * W * C.  The SPMD HLO result shapes are
    # PER-DEVICE (each chip's chunk, 1/P of the payload), so the audit
    # compares per-device bytes: claim = 4 * act / P.  The model's
    # additional (P-1)/P factor is the cross-link fraction of that payload
    # (the diagonal chunk stays local) and is not visible in shapes.
    m_pad = -(-t.mmax // P_) * P_
    act_c64 = 1 * C * nlat * m_pad * 8
    claim = 4 * act_c64 // P_
    a2a = audit.get("all-to-all", 0)
    results["hlo_audit"] = {
        "collective_bytes_per_device": audit,
        "all_to_all_bytes_per_device": a2a,
        "model_claim_bytes_per_device": claim,
        "ratio_vs_model": round(a2a / claim, 3) if claim else None,
    }
    print(f"HLO audit (per-device): all-to-all {a2a/1e6:.2f} MB vs model "
          f"{claim/1e6:.2f} MB (ratio {a2a/claim:.2f}); "
          f"other collectives: "
          f"{ {k: round(v/1e6, 2) for k, v in audit.items()} } MB",
          flush=True)

    # ---- 2. all_to_all timing vs payload size on the virtual mesh ----
    from jax import shard_map
    from jax import lax

    def a2a_fn(a):
        return lax.all_to_all(a, "x", split_axis=0, concat_axis=0,
                              tiled=True)

    rows = []
    for mb in (1, 4, 16, 64):
        n = mb * (1 << 20) // 4
        # global [P^2, n/P^2] sharded on rows -> local [P, n/P^2]: tiled
        # all_to_all needs the local split axis divisible by P
        arr = jnp.asarray(
            rng.standard_normal((P_ * P_, n // (P_ * P_))), jnp.float32
        )
        ash = jax.device_put(arr, NamedSharding(mesh, P("x", None)))
        f = jax.jit(shard_map(a2a_fn, mesh=mesh, in_specs=P("x", None),
                              out_specs=P("x", None)))
        f(ash).block_until_ready()
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            f(ash).block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        rows.append({"payload_mb": mb, "time_s": round(dt, 6)})
        print(f"all_to_all {mb:3d} MB: {dt*1e3:8.3f} ms", flush=True)

    # least-squares fit t = a + bytes/bw over the measured rows
    xs_b = np.array([r["payload_mb"] * (1 << 20) for r in rows], float)
    ys = np.array([r["time_s"] for r in rows], float)
    A = np.stack([np.ones_like(xs_b), xs_b], axis=1)
    coef, *_ = np.linalg.lstsq(A, ys, rcond=None)
    pred = A @ coef
    ss_res = float(((ys - pred) ** 2).sum())
    ss_tot = float(((ys - ys.mean()) ** 2).sum())
    results["timing"] = {
        "rows": rows,
        "latency_s": round(float(coef[0]), 6),
        "effective_bw_gbps": round(1.0 / coef[1] / 1e9, 3)
        if coef[1] > 0 else None,
        "r2_linear_in_bytes": round(1 - ss_res / ss_tot, 4),
    }
    print(f"fit: latency {coef[0]*1e3:.3f} ms, bw "
          f"{1.0/coef[1]/1e9:.2f} GB/s (virtual mesh), "
          f"R^2 {results['timing']['r2_linear_in_bytes']}", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    # merge-preserve sections owned by other auditors (schedule_audit is
    # written by scripts/schedule_audit.py)
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            for k, v in prev.items():
                results.setdefault(k, v)
        except Exception:
            pass
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
