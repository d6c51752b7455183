#!/usr/bin/env python
"""Multi-chip scaling-efficiency benchmark (BASELINE target: >=80% efficiency
at 1 chip / 1 host / N hosts on a pod slice).

Measures the jitted data-parallel (+ optional spatial) train step at
increasing device counts over the available mesh and reports throughput +
efficiency vs. linear scaling from 1 device.

On this rig only ONE real TPU chip is reachable, so real-hardware numbers
cover the 1-chip column; run with
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to exercise the full sharded program (GSPMD collectives included) on the
virtual mesh — functional validation + a smoke of the collective schedule
(virtual-device timings share host cores and are not hardware throughput).

    python scripts/benchmark_scaling.py [--devices 1,2,4,8] [--spatial 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default=None, help="comma list, e.g. 1,2,4,8")
    ap.add_argument("--spatial", type=int, default=1, help="spatial shard dim")
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import dlwpbench_tpu

    dlwpbench_tpu.enable_compile_cache()
    from dlwpbench_tpu.models.unet import UNet
    from dlwpbench_tpu.parallel.mesh import make_mesh, shard_batch
    from dlwpbench_tpu.training.losses import mse_loss

    n_avail = len(jax.devices())
    dev_list = (
        [int(d) for d in args.devices.split(",")]
        if args.devices
        else [d for d in [1, 2, 4, 8] if d <= n_avail]
    )

    T, Cc, Cp, Cq, H, W = args.steps + 1, 4, 1, 8, 32, 64
    model = UNet(
        constant_channels=Cc, prescribed_channels=Cp, prognostic_channels=Cq,
        hidden_channels=(64, 128, 256), context_size=1,
    )
    results = {}
    base = None
    for nd in dev_list:
        x_dim = args.spatial if nd % args.spatial == 0 and nd >= args.spatial else 1
        mesh = make_mesh(nd, x=x_dim)
        B = args.per_device_batch * (nd // x_dim)
        r = np.random.default_rng(0)
        const = r.standard_normal((B, 1, Cc, H, W)).astype(np.float32)
        pres = r.standard_normal((B, T, Cp, H, W)).astype(np.float32)
        prog = r.standard_normal((B, T, Cq, H, W)).astype(np.float32)
        target = r.standard_normal((B, T - 1, Cq, H, W)).astype(np.float32)

        params = model.init(jax.random.PRNGKey(0), const[:1], pres[:1], prog[:1])
        tx = optax.adamw(1e-3)
        opt_state = tx.init(params)
        params, opt_state = jax.device_put(
            (params, opt_state), NamedSharding(mesh, P())
        )
        batch = shard_batch(
            mesh, (const, pres, prog, target),
            spatial_axis=3 if x_dim > 1 else None,
        )

        @jax.jit
        def train_step(params, opt_state, const, pres, prog, target):
            def loss_fn(p):
                return mse_loss(model.apply(p, const, pres, prog), target)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        p2, o2 = params, opt_state
        p2, o2, loss = train_step(p2, o2, *batch)  # compile
        float(loss)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            p2, o2, loss = train_step(p2, o2, *batch)
            float(loss)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        gps = B * args.steps * H * W / dt
        if base is None:
            base = gps / nd
        eff = gps / (nd * base)
        results[nd] = {
            "mesh": f"{nd//x_dim}x{x_dim}",
            "step_s": round(dt, 4),
            "gridpoints_per_s": round(gps, 1),
            "efficiency": round(eff, 3),
        }
        print(
            f"{nd} devices (mesh {nd//x_dim}x{x_dim}): {dt*1e3:8.1f} ms/step, "
            f"{gps/1e6:8.2f} M gp/s, efficiency {eff:.2%}",
            flush=True,
        )

    os.makedirs("outputs", exist_ok=True)
    with open("outputs/scaling.json", "w") as f:
        json.dump(results, f, indent=1)
    print("-> outputs/scaling.json")


if __name__ == "__main__":
    main()
