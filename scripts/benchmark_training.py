#!/usr/bin/env python
"""Training-throughput benchmark — comparable to the reference's measured
runtime/memory tables (BASELINE.md: s/epoch at batch_size=1 on an unstated
NVIDIA GPU; e.g. U-Net 20.54 s/epoch at 50k params).

Measures the full jitted train step (forward + backward + AdamW) at the
reference's training protocol (sequence_length=15 -> 14 predicted frames) and
reports the equivalent seconds/epoch for the 1979-2014 split (3505 windows)
plus device memory stats where the runtime exposes them.

    python scripts/benchmark_training.py [--models unet,...] [--batch 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WINDOWS_PER_EPOCH = 3505  # 1979-2014, 6-hourly, non-overlapping seq-15 windows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="unet,modernunet,fno2d,fourcastnet,sfno2d")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=15)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    import dlwpbench_tpu

    dlwpbench_tpu.enable_compile_cache()
    from benchmark_models import model_zoo

    from dlwpbench_tpu.training.losses import mse_loss

    B = args.batch
    T = args.seq
    H, W, Cc, Cp, Cq = 32, 64, 4, 1, 8
    zoo = model_zoo(B, H, W, Cc, Cp, Cq)
    keep = set(args.models.split(","))
    zoo = {k: v for k, v in zoo.items() if k in keep}

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    dev = jax.devices()[0]

    r = np.random.default_rng(0)
    const = jnp.asarray(r.standard_normal((B, 1, Cc, H, W)), jnp.float32)
    pres = jnp.asarray(r.standard_normal((B, T, Cp, H, W)), jnp.float32)
    prog = jnp.asarray(r.standard_normal((B, T, Cq, H, W)), jnp.float32)
    target = jnp.asarray(
        r.standard_normal((B, T - 1, Cq, H, W)), jnp.float32
    )

    results = {}
    for name, model in zoo.items():
        try:
            # remat keeps the backward program small (the remote compiler
            # crashes on full 14-step backward graphs for the larger nets)
            if hasattr(model, "remat"):
                model = model.clone(remat=True)
            tgt = target[:, : T - model.context_size]
            if cpu is not None:
                with jax.default_device(cpu):
                    params = jax.jit(model.init)(
                        jax.random.PRNGKey(0), const, pres, prog
                    )
            else:
                params = jax.jit(model.init)(jax.random.PRNGKey(0), const, pres, prog)
            n_params = sum(int(x.size) for x in jax.tree.leaves(params))
            tx = optax.adamw(1e-3, weight_decay=1e-5)
            opt_state = tx.init(params)
            p2, o2, c2, pr2, pg2, t2 = jax.device_put(
                (params, opt_state, const, pres, prog, tgt), dev
            )

            REPEATS = 4

            @jax.jit
            def chained(p, o, c, pr, pg, t):
                def body(carry, _):
                    p, o = carry

                    def loss_fn(pp):
                        return mse_loss(model.apply(pp, c, pr, pg), t)

                    loss, grads = jax.value_and_grad(loss_fn)(p)
                    updates, o2_ = tx.update(grads, o, p)
                    return (optax.apply_updates(p, updates), o2_), loss

                (p, o), losses = jax.lax.scan(body, (p, o), None, length=REPEATS)
                return losses.sum()

            t0 = time.perf_counter()
            float(chained(p2, o2, c2, pr2, pg2, t2))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(p2, o2, c2, pr2, pg2, t2))
                times.append((time.perf_counter() - t0) / REPEATS)
            dt = float(np.median(times))
            epoch_s = dt * (WINDOWS_PER_EPOCH / B)
            mem = {}
            try:
                stats = dev.memory_stats() or {}
                mem = {
                    "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                    "bytes_in_use": stats.get("bytes_in_use"),
                }
            except Exception:
                pass
            results[name] = {
                "params": n_params,
                "train_step_s": round(dt, 4),
                "epoch_equivalent_s": round(epoch_s, 2),
                "compile_s": round(compile_s, 1),
                **mem,
            }
            peak = mem.get("peak_bytes_in_use")
            print(
                f"{name:12s} {n_params/1e6:6.2f}M  step {dt*1e3:7.1f} ms "
                f"(batch {B})  ~{epoch_s:7.1f} s/epoch"
                + (f"  peak {peak/1e6:.0f} MB" if peak else ""),
                flush=True,
            )
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)

    os.makedirs("outputs", exist_ok=True)
    # merge with any existing results so partial re-runs do not drop models
    try:
        with open("outputs/benchmark_training.json") as f:
            prev = json.load(f).get("results", {})
    except Exception:
        prev = {}
    results = {**prev, **results}
    with open("outputs/benchmark_training.json", "w") as f:
        json.dump({"batch": B, "seq": T, "results": results}, f, indent=1)
    print("-> outputs/benchmark_training.json")


if __name__ == "__main__":
    main()
