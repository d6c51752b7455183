#!/usr/bin/env python
"""Zoo-wide runtime/memory benchmark matrix (the reference's measured tables,
`scripts/plot_results.py:483-570`, collected with batch_size=1 runs).

Measures per-model rollout throughput on the current device at WeatherBench
5.625-degree shapes and writes `outputs/benchmark_matrix.json` plus a
runtime-over-params plot.

    python scripts/benchmark_models.py [--models unet,fno2d,...] [--batch 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def model_zoo(B, H, W, Cc=4, Cp=1, Cq=8):
    """Benchmark configs ~ the reference's small/medium rungs."""
    from dlwpbench_tpu.models.convlstm import ConvLSTM
    from dlwpbench_tpu.models.distana import DISTANA
    from dlwpbench_tpu.models.fno import FNO2DModule, TFNO2DModule
    from dlwpbench_tpu.models.fourcastnet import FourCastNet
    from dlwpbench_tpu.models.graphcast import GraphCastNet
    from dlwpbench_tpu.models.mgn import MeshGraphNet
    from dlwpbench_tpu.models.modern_unet import DiffModernUNet, ModernUNet
    from dlwpbench_tpu.models.pangu import PanguWeather
    from dlwpbench_tpu.models.sfno import SFNO2DModule
    from dlwpbench_tpu.models.swin import SwinTransformer
    from dlwpbench_tpu.models.unet import UNet

    kw = dict(constant_channels=Cc, prescribed_channels=Cp, prognostic_channels=Cq)
    return {
        "convlstm": ConvLSTM(hidden_sizes=(64, 64), **kw),
        "unet": UNet(hidden_channels=(64, 128, 256), **kw),
        "modernunet": ModernUNet(hidden_channels=(64, 128, 256), norm=True, **kw),
        "fno2d": FNO2DModule(hidden_channels=32, n_layers=4, **kw),
        "tfno2d": TFNO2DModule(hidden_channels=32, n_layers=4, rank=0.8, **kw),
        "fourcastnet": FourCastNet(
            img_height=H, img_width=W, patch_size=(1, 1), embed_dim=128,
            depth=6, num_blocks=8, **kw,
        ),
        "sfno2d": SFNO2DModule(embed_dim=128, num_layers=4, height=H, width=W, **kw),
        "swin": SwinTransformer(
            # heads chosen so head_dim=32 (flash-kernel eligible) at both stages
            img_height=H, img_width=W, embed_dim=96, depths=(4, 4),
            num_heads=(3, 6), use_flash_attention=True, **kw,
        ),
        "pangu": PanguWeather(
            embed_dim=96, num_heads=(6, 12, 12, 6), patch_size=(1, 1),
            n_lat=H, n_lon=W, **kw,
        ),
        "mgn": MeshGraphNet(
            processor_size=4, hidden_dim_processor=64, hidden_dim_node_encoder=64,
            hidden_dim_edge_encoder=64, hidden_dim_node_decoder=64,
            graph_type="delaunay", **kw,
        ),
        "graphcast": GraphCastNet(
            input_height=H, input_width=W, mesh_level=3, processor_layers=4,
            hidden_dim=128, **kw,
        ),
        # VERDICT r4 #7: the two families previously absent from every
        # performance surface.  DISTANA at its reference config scale;
        # the diffusion model at the reference's own
        # `model/diffusion_modernunet.yaml` scale — its rollout runs the
        # FULL DDPM refinement loop (num_refinement_step+1 forwards per
        # step, reference `modern_unet.py:175-208`), the reference's most
        # expensive eval path.
        "distana": DISTANA(hidden_size=64, layers=4, **kw),
        "diffusion": DiffModernUNet(
            hidden_channels=(64, 128, 256, 1024), context_size=2,
            num_refinement_step=5, norm=True, use_scale_shift_norm=True,
            **kw,
        ),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import dlwpbench_tpu

    dlwpbench_tpu.enable_compile_cache()

    B, T, H, W = args.batch, args.steps + 1, 32, 64
    Cc, Cp, Cq = 4, 1, 8
    zoo = model_zoo(B, H, W, Cc, Cp, Cq)
    if args.models:
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

    results = {}
    for name, model in zoo.items():
        try:
            if cpu is not None:
                with jax.default_device(cpu):
                    params = jax.jit(model.init)(
                        jax.random.PRNGKey(0), const, pres, prog
                    )
            else:
                params = jax.jit(model.init)(jax.random.PRNGKey(0), const, pres, prog)
            n_params = sum(int(x.size) for x in jax.tree.leaves(params))
            p2, c2, pr2, pg2 = jax.device_put((params, const, pres, prog), dev)

            # Chain REPEATS rollouts with a data dependence inside one jit:
            # the host<->device relay on this rig has ~35ms round-trip latency
            # and lazily elides unfetched work, so per-call timing is invalid.
            REPEATS = 8

            @jax.jit
            def chained(p, c, pr, pg):
                def body(carry, _):
                    out = model.apply(p, c, pr, carry)
                    nxt = pg + out[:, -1:].mean() * 1e-8
                    return nxt, out.mean()

                _, means = jax.lax.scan(body, pg, None, length=REPEATS)
                return means.sum()

            t0 = time.perf_counter()
            float(chained(p2, c2, pr2, pg2))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                float(chained(p2, c2, pr2, pg2))
                times.append((time.perf_counter() - t0) / REPEATS)
            dt = float(np.median(times))
            gps = B * args.steps * H * W / dt
            results[name] = {
                "params": n_params,
                "rollout_s": round(dt, 5),
                "compile_s": round(compile_s, 2),
                "gridpoints_per_s": round(gps, 1),
            }
            print(
                f"{name:12s} {n_params/1e6:7.2f}M params  {dt*1e3:8.2f} ms/rollout "
                f"({gps/1e6:7.2f} M gp/s, compile {compile_s:.1f}s)",
                flush=True,
            )
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)

    os.makedirs("outputs", exist_ok=True)
    # merge with any existing results so partial re-runs do not drop models
    try:
        with open("outputs/benchmark_matrix.json") as f:
            prev = json.load(f).get("results", {})
    except Exception:
        prev = {}
    results = {**prev, **results}
    with open("outputs/benchmark_matrix.json", "w") as f:
        json.dump(
            {"batch": B, "steps": args.steps, "grid": [H, W], "results": results},
            f,
            indent=1,
        )

    try:
        from dlwpbench_tpu.evaluation.plots import multi_x_over_params_plot

        ladder = {
            k: {v["params"]: v["rollout_s"]}
            for k, v in results.items()
            if "params" in v
        }
        multi_x_over_params_plot(
            ladder, "rollout seconds", "outputs/runtime_over_params.png", logy=True
        )
    except Exception:
        pass
    print("-> outputs/benchmark_matrix.json")


if __name__ == "__main__":
    main()
