#!/usr/bin/env python
"""Training CLI (reference `scripts/train.py`):

    python scripts/train.py model=unet data=synthetic training.epochs=3

Composes the config from `configs/` (Hydra-style groups + overrides), builds
the model from the registry, trains with the jitted harness, and writes
best/last checkpoints + a config snapshot under `outputs/<model.name>/`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _make_dp_mesh(n: int):
    """`training.data_parallel: N` -> an N-device data mesh (0/1 = off).

    The CLI face of `Trainer(spmd_mesh=...)`: batches shard over the
    "data" axis, params replicate, XLA all-reduces gradients."""
    if not n or n <= 1:
        return None
    from dlwpbench_tpu.parallel.mesh import make_mesh

    return make_mesh(n, data=n, x=1)


def main(argv):
    import dlwpbench_tpu

    dlwpbench_tpu.enable_compile_cache()
    from dlwpbench_tpu.data.sources import build_datasets
    from dlwpbench_tpu.models import registry  # populates the registry
    from dlwpbench_tpu.training.config import load_config, save_config
    from dlwpbench_tpu.training.losses import latitude_weights
    from dlwpbench_tpu.training.trainer import Trainer, load_checkpoint

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
    cfg = load_config(cfg_dir, overrides=argv)

    assert cfg.training.sequence_length > cfg.model.context_size, (
        "No time steps to predict, increase the prediction window."
    )

    import dlwpbench_tpu.models  # noqa: F401  (registers the zoo)

    # Rematerialize rollout steps during training (activation memory O(step)
    # instead of O(rollout); also keeps backward programs small enough for
    # the compiler).  Override with model.remat=false.
    if "remat" not in cfg.model:
        cfg.model["remat"] = True
    model = registry.build_model(cfg.model)
    ctx = int(cfg.model.context_size)
    train_ds, val_ds, test_ds, stats = build_datasets(
        cfg.data, cfg.training, cfg.validation, cfg.get("testing"), ctx
    )

    lat_w = None
    # lat-weighted validation only applies to the (lat-lon) weather grids,
    # not to the periodic Navier-Stokes domain or HEALPix face layouts
    if (
        cfg.data.get("type") != "NavierStokes"
        and cfg.data.get("healpix_nside") in (None, "null")
        and "height" in cfg.data
    ):
        lats = np.linspace(
            -90 + 180 / cfg.data.height / 2, 90 - 180 / cfg.data.height / 2,
            cfg.data.height,
        )
        lat_w = latitude_weights(lats)[:, None]

    # training.multihost=true: join the multi-process job (rank discovery
    # from torch-style env vars / SLURM / OpenMPI / TPU-pod metadata —
    # the reference DistributedManager's role, `manager.py:206-316`),
    # mesh over ALL processes' devices, deterministic per-host epoch
    # shards through dataset.batches(host_id=..., n_hosts=...).
    host_id, n_hosts = 0, 1
    spmd_mesh = _make_dp_mesh(int(cfg.training.get("data_parallel", 0)))
    if bool(cfg.training.get("multihost", False)):
        from dlwpbench_tpu.parallel import launch

        launch.initialize()
        host_id, n_hosts = launch.host_info()
        spmd_mesh = launch.global_mesh(
            x=int(cfg.training.get("model_parallel", 1))
        )
        if cfg.verbose:
            print(f"multihost: process {host_id}/{n_hosts}, "
                  f"mesh {spmd_mesh.shape}")

    trainer = Trainer(
        model,
        learning_rate=float(cfg.training.learning_rate),
        weight_decay=float(cfg.training.optimizer_weight_decay),
        epochs=int(cfg.training.epochs),
        clip_gradients=bool(cfg.training.clip_gradients),
        gradient_accumulation_steps=int(cfg.training.gradient_accumulation_steps),
        lat_weights=lat_w,
        seed=int(cfg.get("seed", 1234)),
        training_type=str(cfg.training.get("type", "regular")),
        num_refinement_steps=int(cfg.training.get("num_refinement_steps", 5)),
        min_noise_std=float(cfg.training.get("min_noise_std", 4e-4)),
        ema_decay=float(cfg.training.get("ema_decay", 0.995)),
        compute_dtype=cfg.training.get("compute_dtype"),
        spmd_mesh=spmd_mesh,
        host_id=host_id,
        n_hosts=n_hosts,
    )

    first = next(iter(train_ds.batches(1)))
    state = trainer.init(first)
    if cfg.verbose:
        print(f"Model {cfg.model.name} has {trainer.n_params(state)} trainable parameters")

    run_dir = cfg.get("run_dir") or os.path.join("outputs", cfg.model.name)
    os.makedirs(run_dir, exist_ok=True)
    save_config(cfg, os.path.join(run_dir, "config.yaml"))

    if cfg.training.continue_training:
        state = load_checkpoint(run_dir, cfg.model.name, state, kind="last")
        print(f"Restored epoch {state.epoch}")

    trainer.fit(
        state,
        train_ds,
        val_ds,
        batch_size=int(cfg.training.batch_size),
        val_batch_size=int(cfg.validation.batch_size),
        run_dir=run_dir if cfg.training.save_model else None,
        model_name=cfg.model.name,
        verbose=bool(cfg.verbose),
        checkpoint_every=int(cfg.training.get("checkpoint_every", 1)),
    )


if __name__ == "__main__":
    main(sys.argv[1:])
