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
