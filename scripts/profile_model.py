#!/usr/bin/env python
"""Capture a jax.profiler device trace + cost summary for one zoo family.

    python scripts/profile_model.py --model fourcastnet [--batch 8]
        [--seq 15] [--train] [--out-dir results/traces/<model>]

Produces a TensorBoard-loadable trace directory plus `profile.json` with
steady-state step percentiles (StepTimer), XLA cost-model FLOPs (scan
trip-count aware) and the compiled memory plan — the committed-evidence
path for "profile and explain the floor" performance work (VERDICT r1
weak #8; the round-2 FourCastNet analysis in
`results/fourcastnet_analysis.md` was collected this way by hand).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=15)
    ap.add_argument("--grid", default="32x64")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--train", action="store_true",
                    help="profile the remat train step instead of inference")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--dtype", default=None, choices=(None, "bfloat16"),
                    help="mixed-precision train step (bf16 compute)")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu for relay-less smoke)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    import dlwpbench_tpu

    dlwpbench_tpu.enable_compile_cache()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmark_models import model_zoo

    from dlwpbench_tpu.utils import profiling

    B, T = args.batch, args.seq
    H, W = (int(x) for x in args.grid.split("x"))
    Cc, Cp, Cq = 4, 1, 8
    model = model_zoo(B, H, W, Cc, Cp, Cq)[args.model]

    r = np.random.default_rng(0)
    const = jnp.asarray(r.standard_normal((B, 1, Cc, H, W)), jnp.float32)
    pres = jnp.asarray(r.standard_normal((B, T, Cp, H, W)), jnp.float32)
    prog = jnp.asarray(r.standard_normal((B, T, Cq, H, W)), jnp.float32)

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu if cpu is not None else jax.devices()[0]):
        params = jax.jit(model.init)(jax.random.PRNGKey(0), const, pres, prog)
    params = jax.device_put(params, jax.devices()[0])

    trips = T if args.model.startswith(("convlstm", "distana")) \
        else T - model.context_size
    if args.train:
        import optax

        from dlwpbench_tpu.training.losses import mse_loss

        if hasattr(model, "remat"):
            model = model.clone(remat=True)
        tgt = prog[:, 1:]
        tx = optax.adamw(1e-3)
        opt = jax.device_put(tx.init(params), jax.devices()[0])

        cdt = jnp.dtype(args.dtype) if args.dtype else None

        @jax.jit
        def step(p, o):
            def loss_fn(pp):
                if cdt is not None:
                    pp = jax.tree.map(lambda x: x.astype(cdt), pp)
                    out = model.apply(pp, const.astype(cdt),
                                      pres.astype(cdt), prog.astype(cdt))
                    return mse_loss(out.astype(jnp.float32), tgt)
                return mse_loss(model.apply(pp, const, pres, prog), tgt)

            loss, g = jax.value_and_grad(loss_fn)(p)
            up, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, up), o2, loss

        def run():
            nonlocal params, opt
            params, opt, loss = step(params, opt)
            jax.block_until_ready(loss)
    else:
        fwd = jax.jit(lambda p: model.apply(p, const, pres, prog))

        def run():
            jax.block_until_ready(fwd(params))

    run()  # compile outside the trace

    out_dir = args.out_dir or os.path.join(
        "results", "traces",
        args.model + ("_train" if args.train else "_infer"),
    )
    os.makedirs(out_dir, exist_ok=True)
    timer = profiling.StepTimer(skip=0)
    with profiling.trace(out_dir):
        for _ in range(args.steps):
            with timer, profiling.annotate(f"{args.model}_step"):
                run()

    # cost summary: scan-trip-count-aware flops + compiled memory plan,
    # lowered on the host CPU backend (relay hides cost_analysis)
    info = {"model": args.model, "batch": B, "seq": T, "grid": args.grid,
            "mode": "train" if args.train else "infer",
            **timer.summary()}
    try:
        with jax.default_device(cpu):
            if args.train:
                lowered = jax.jit(step).lower(
                    jax.device_put(params, cpu), jax.device_put(opt, cpu)
                )
            else:
                lowered = jax.jit(
                    lambda p: model.apply(p, const, pres, prog)
                ).lower(jax.device_put(params, cpu))
            compiled = lowered.compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            f = float(cost.get("flops", 0.0)) * trips
            info["flops_per_step"] = f
            if timer.summary().get("median_s"):
                info["achieved_tflops"] = round(
                    f / timer.summary()["median_s"] / 1e12, 3
                )
            ma = compiled.memory_analysis()
            if ma is not None:
                info["xla_plan_mb"] = round(
                    (getattr(ma, "argument_size_in_bytes", 0)
                     + getattr(ma, "temp_size_in_bytes", 0)
                     + getattr(ma, "output_size_in_bytes", 0)) / 1e6, 1)
    except Exception as e:
        info["cost_error"] = f"{type(e).__name__}: {e}"

    with open(os.path.join(out_dir, "profile.json"), "w") as fjson:
        json.dump(info, fjson, indent=1)
    print(json.dumps(info))
    print(f"-> {out_dir} (TensorBoard-loadable trace + profile.json)")


if __name__ == "__main__":
    main()
