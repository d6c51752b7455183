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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WINDOWS_PER_EPOCH = 3505  # 1979-2014, 6-hourly, non-overlapping seq-15 windows


def measure_diffusion(model, shapes_np, dev, cpu, compute_dtype,
                      repeats=4, iters=3):
    """Diffusion TRAIN step at its real protocol (VERDICT r4 #7): one
    v-prediction `single_forward` + AdamW per step (Trainer's
    `_diffusion_loss`, reference `train.py:226-258`) — NOT the refinement
    rollout, which is inference-only.  Mirrors `benchmark_ladder.measure`'s
    chained-scan timing so rows are comparable."""
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from dlwpbench_tpu.ops import ddpm as ddpm_ops

    cdt = jnp.dtype(compute_dtype) if compute_dtype else None
    const, pres, prog, _ = (jnp.asarray(a) for a in shapes_np)
    ctx = model.context_size
    prog_w = prog[:, : ctx + 1]          # diffusion window: ctx + 1
    pres_w = pres[:, : ctx] if pres.shape[2] else None
    target = prog_w[:, ctx:]
    sched = ddpm_ops.make_refiner_schedule(1000, 4e-4)

    with jax.default_device(cpu if cpu is not None else dev):
        y0 = jnp.zeros_like(target)
        k0 = jnp.zeros((prog.shape[0],), jnp.int32)
        params = jax.jit(
            lambda r: model.init(r, const, pres_w, prog_w[:, :ctx], y0, k0,
                                 method="single_forward")
        )(jax.random.PRNGKey(0))
    tx = optax.adamw(1e-3, weight_decay=1e-5)
    opt_state = tx.init(params)

    def chained(p, o, c, pr, pg, t, rng):
        def body(carry, i):
            p, o, rng = carry
            rng, kk, kn = jax.random.split(rng, 3)
            k = jax.random.randint(kk, (), 0, sched.num_timesteps - 1)
            res = t - pg[:, ctx - 1: ctx]
            noise = jax.random.normal(kn, res.shape, res.dtype)
            y = ddpm_ops.add_noise(sched, res, noise, k)
            v_t = ddpm_ops.v_prediction_target(sched, res, noise, k)

            def loss_fn(pp):
                cc, prr, pgg, yy = c, pr, pg, y
                if cdt is not None:
                    pp = jax.tree.map(lambda x: x.astype(cdt), pp)
                    cc = None if cc is None else cc.astype(cdt)
                    prr = None if prr is None else prr.astype(cdt)
                    pgg, yy = pgg.astype(cdt), yy.astype(cdt)
                out = model.apply(
                    pp, cc, prr, pgg[:, :ctx], yy,
                    jnp.full((pg.shape[0],), k), method="single_forward",
                )
                return ((out[:, None].astype(jnp.float32) - v_t) ** 2).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o2 = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o2, rng), loss

        (p, o, _), losses = jax.lax.scan(
            body, (p, o, rng), jnp.arange(repeats))
        return losses.sum()

    args = (params, opt_state, const, pres_w, prog_w, target,
            jax.random.PRNGKey(1))
    args = jax.device_put(args, dev)
    jitted = jax.jit(chained)
    t0 = time.perf_counter()
    compiled = jitted.lower(*args).compile()
    compile_s = time.perf_counter() - t0
    mem = {}
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            mem["xla_plan_mb"] = round(
                (getattr(ma, "argument_size_in_bytes", 0)
                 + getattr(ma, "temp_size_in_bytes", 0)
                 + getattr(ma, "output_size_in_bytes", 0)) / 1e6, 1)
    except Exception:
        pass
    float(compiled(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(compiled(*args))
        times.append((time.perf_counter() - t0) / repeats)
    n_params = sum(int(x.size) for x in jax.tree.leaves(params))
    return float(np.median(times)), compile_s, mem, n_params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="unet,modernunet,fno2d,fourcastnet,sfno2d")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=15)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu for relay-less smoke)")
    ap.add_argument("--dtype", default=None, choices=(None, "bfloat16"),
                    help="mixed-precision compute dtype (bf16 compute, "
                         "fp32 master params — the Trainer's recipe); "
                         "results go to benchmark_training_bf16.json")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dlwpbench_tpu

    dlwpbench_tpu.enable_compile_cache()
    from benchmark_ladder import measure
    from benchmark_models import model_zoo

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
    shapes_np = (
        r.standard_normal((B, 1, Cc, H, W)).astype(np.float32),
        r.standard_normal((B, T, Cp, H, W)).astype(np.float32),
        r.standard_normal((B, T, Cq, H, W)).astype(np.float32),
        r.standard_normal((B, T - 1, Cq, H, W)).astype(np.float32),
    )

    results = {}
    for name, model in zoo.items():
        try:
            # one shared harness with the ladder (`benchmark_ladder.measure`):
            # chained remat train steps (fwd + bwd + AdamW), relay-latency
            # amortized, plus XLA plan memory and cost-model FLOPs
            trips = T if name.startswith(("convlstm", "distana")) \
                else T - model.context_size
            if name == "diffusion":
                # real protocol: one v-pred single_forward per step
                # (no rollout), so no trip multiply
                dt, compile_s, mem, n_params = measure_diffusion(
                    model, shapes_np, dev, cpu, compute_dtype=args.dtype,
                )
            else:
                n_params = sum(
                    int(np.prod(a.shape))
                    for a in jax.tree.leaves(jax.eval_shape(
                        model.init, jax.random.PRNGKey(0),
                        *(jax.ShapeDtypeStruct(s.shape, s.dtype)
                          for s in shapes_np[:3])))
                )
                dt, compile_s, mem = measure(
                    model, shapes_np, dev, cpu, rollout_trips=trips,
                    compute_dtype=args.dtype,
                )
            epoch_s = dt * (WINDOWS_PER_EPOCH / B)
            results[name] = {
                "params": n_params,
                "train_step_s": round(dt, 4),
                "epoch_equivalent_s": round(epoch_s, 2),
                "compile_s": round(compile_s, 1),
                **mem,
            }
            if name == "diffusion":
                results[name]["note"] = (
                    "v-prediction single_forward train step (reference "
                    "train.py:226-258 protocol); inference pays the "
                    "DDPM refinement loop instead — see "
                    "benchmark_matrix.json"
                )
            peak = mem.get("peak_mb") or mem.get("xla_plan_mb")
            print(
                f"{name:12s} {n_params/1e6:6.2f}M  step {dt*1e3:7.1f} ms "
                f"(batch {B})  ~{epoch_s:7.1f} s/epoch"
                + (f"  mem {peak:.0f} MB" if peak else ""),
                flush=True,
            )
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)

    os.makedirs("outputs", exist_ok=True)
    out_name = ("outputs/benchmark_training_bf16.json" if args.dtype
                else "outputs/benchmark_training.json")
    # merge with any existing results so partial re-runs do not drop models
    try:
        with open(out_name) as f:
            prev = json.load(f).get("results", {})
    except Exception:
        prev = {}
    results = {**prev, **results}
    payload = {"batch": B, "seq": T, "results": results}
    if args.dtype:
        payload["compute_dtype"] = args.dtype
    with open(out_name, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"-> {out_name}")


if __name__ == "__main__":
    main()
