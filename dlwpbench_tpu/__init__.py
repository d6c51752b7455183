"""dlwpbench_tpu — a TPU-native deep-learning weather-prediction benchmark framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of dlwp-benchmark
(arXiv:2407.14129): a pseudo-spectral Navier-Stokes solver for synthetic data,
a backbone zoo (ConvLSTM, U-Net/ModernUNet, FNO/TFNO, FourCastNet/AFNO, SFNO
with a from-scratch spherical-harmonic transform, Swin, Pangu-Weather, HEALPix
variants, MeshGraphNet, GraphCast, PDE-Refiner diffusion), autoregressive
`lax.scan` rollouts, latitude-weighted RMSE/ACC/spectral evaluation, and
multi-chip domain decomposition over `jax.sharding.Mesh`.

Layering (see SURVEY.md §7):
  grids/      L0 — lat-lon + HEALPix + icosphere geometry, remap operators
  ops/        L1 — padding, convs, spectral (FFT/SHT), attention, graph, DDPM
  parallel/   L2 — device mesh, halo exchange, distributed spectral transforms
  models/     L3 — the model zoo sharing one rollout calling convention
  data/       L4 — NS solver, WeatherBench-style datasets, normalization
  training/   L5 — config, losses, train step, EMA, checkpointing
  evaluation/ L6 — rollout evaluation, metrics, baselines
"""

__version__ = "0.1.0"


def enable_compile_cache():
    """Enable JAX's persistent compilation cache with a per-backend dir.

    This host compiles slowly (TPU compiles go through a remote tunnel; CPU
    LLVM is slow on the 4-core VM), so caching compiled executables across
    processes is a large win.  TPU and CPU caches are kept in separate dirs:
    TPU-side runs route even CPU AOT compiles through the remote compiler,
    whose x86 feature set differs from this host — loading those entries in a
    CPU-only process risks SIGILL.
    """
    import jax

    backend = jax.default_backend()
    cache_dir = (
        "/root/repo/.jax_cache" if backend == "axon" else "/tmp/dlwpbench_jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
