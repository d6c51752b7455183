"""Multi-host process bootstrap — the reference DistributedManager's
rank-discovery half, TPU-native.

The reference initializes torch.distributed from three environments
(`models/graphcast/distributed/manager.py:206-316`):
  - torch-style env vars  MASTER_ADDR / MASTER_PORT / RANK / WORLD_SIZE
  - SLURM                 SLURM_PROCID / SLURM_NPROCS / SLURM_LAUNCH_NODE_IPADDR
  - OpenMPI               OMPI_COMM_WORLD_RANK / _SIZE (+ MASTER_ADDR)

The TPU equivalent is `jax.distributed.initialize`, which already
auto-detects TPU pods, SLURM, and OpenMPI through its cluster plugins.
This module adds the one scheme jax does NOT read — the reference's
torch-style env vars — and a single `initialize()` entry point that picks
whichever is present, so a launch script written for the reference
(`RANK=3 WORLD_SIZE=8 MASTER_ADDR=...`) drives this framework unchanged.

After `initialize()`, `global_mesh()` builds a Mesh over ALL processes'
devices for `Trainer(spmd_mesh=...)`, and `host_info()` feeds the
deterministic per-host input sharding (`dataset.batches(host_id=...)`).
"""

from __future__ import annotations

import os
from typing import Any


def torch_style_spec(env: dict | None = None) -> dict | None:
    """Parse MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE (reference
    `manager.py:206-249`) into jax.distributed.initialize kwargs, or None
    when the variables are not set."""
    e = os.environ if env is None else env
    if "MASTER_ADDR" not in e or "RANK" not in e or "WORLD_SIZE" not in e:
        return None
    port = e.get("MASTER_PORT", "12355")  # the reference's default port
    return {
        "coordinator_address": f"{e['MASTER_ADDR']}:{port}",
        "num_processes": int(e["WORLD_SIZE"]),
        "process_id": int(e["RANK"]),
    }


def initialize(spec: dict | None = None) -> bool:
    """Connect this process to the multi-host job.

    Order: explicit `spec` kwargs > torch-style env vars > jax's own
    auto-detection (TPU pod metadata / SLURM / OpenMPI plugins).  Returns
    True when a multi-process runtime was initialized, False for
    single-process runs (WORLD_SIZE absent or 1) — callers can branch on
    it without try/except.
    """
    import jax

    # idempotent: a process that already joined (e.g. the CLI called after
    # a library-level initialize) must not re-run the handshake.
    # is_initialized() does NOT touch the XLA backend, which must stay
    # uninitialized until the real jax.distributed.initialize call.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1

    spec = spec or torch_style_spec()
    if spec is not None:
        if spec["num_processes"] <= 1:
            return False
        jax.distributed.initialize(**spec)
        return True
    # jax auto-detection covers TPU pods / SLURM / OpenMPI; only engage it
    # when one of those environments is visibly present (calling it on a
    # bare single host raises).
    if any(k in os.environ for k in (
        "SLURM_PROCID", "OMPI_COMM_WORLD_RANK", "TPU_WORKER_HOSTNAMES",
        "CLOUD_TPU_TASK_ID",
    )) and os.environ.get("DLWPBENCH_AUTO_DISTRIBUTED", "1") == "1":
        try:
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:
            return False
    return False


def host_info() -> tuple[int, int]:
    """(host_id, n_hosts) for the per-host input sharding."""
    import jax

    return jax.process_index(), jax.process_count()


def global_mesh(data: int | None = None, x: int = 1) -> Any:
    """Mesh over ALL processes' devices: ("data", "x") with data spanning
    hosts (DCN) and x the intra-host/ICI model axis."""
    from dlwpbench_tpu.parallel.mesh import make_mesh
    import jax

    n = len(jax.devices())
    if n % x:
        raise ValueError(f"{n} global devices not divisible by x={x}")
    return make_mesh(n, data=(data or n // x), x=x)
