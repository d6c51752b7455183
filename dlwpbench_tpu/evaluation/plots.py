"""Result plotting — reference `scripts/plot_results.py` (999 LoC of paper
figures) and `scripts/additional_plot.py` (train-time W&B images).

Provides the same figure families over our metrics files:
- metric-over-parameters curves per model (RMSE/ACC/runtime/memory ladders);
- RMSE/ACC over lead time overlays;
- per-gridpoint RMSE maps and output-vs-target panels (train-time images);
- zonal kinetic-energy / physical-soundness bar charts.

All functions take plain numpy + dicts (no wandb); figures are saved PNG.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def multi_x_over_params_plot(
    results: dict[str, dict[int, float]],
    ylabel: str,
    out_path: str,
    logx: bool = True,
    logy: bool = False,
):
    """results[model][n_params] = value (reference `multi_x_over_params_plot`)."""
    fig, ax = plt.subplots(figsize=(5, 3.5))
    for model, ladder in results.items():
        ps = sorted(ladder)
        ax.plot(ps, [ladder[p] for p in ps], marker="o", label=model)
    if logx:
        ax.set_xscale("log")
    if logy:
        ax.set_yscale("log")
    ax.set_xlabel("#parameters")
    ax.set_ylabel(ylabel)
    ax.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def rmse_per_gridpoint_plot(
    outputs: np.ndarray, targets: np.ndarray, out_path: str, title: str = ""
):
    """Time/sample-mean RMSE map (reference `additional_plot.py:6-26`)."""
    rmse = np.sqrt(((outputs - targets) ** 2).mean(axis=tuple(range(outputs.ndim - 2))))
    fig, ax = plt.subplots(figsize=(5, 2.6))
    im = ax.imshow(rmse, origin="lower", cmap="viridis")
    fig.colorbar(im, ax=ax, shrink=0.8)
    ax.set_title(title or "RMSE per gridpoint")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def output_vs_target_plot(
    output: np.ndarray, target: np.ndarray, out_path: str, title: str = ""
):
    """Side-by-side output/target/diff panels (reference `additional_plot.py:28-54`)."""
    fig, axes = plt.subplots(1, 3, figsize=(9, 2.4))
    vmin, vmax = np.percentile(target, [2, 98])
    for ax, (arr, name) in zip(
        axes,
        [(output, "output"), (target, "target"), (output - target, "difference")],
    ):
        im = ax.imshow(arr, origin="lower", cmap="RdBu_r",
                       vmin=vmin if name != "difference" else None,
                       vmax=vmax if name != "difference" else None)
        ax.set_title(name, fontsize=8)
        ax.set_axis_off()
        fig.colorbar(im, ax=ax, shrink=0.7)
    fig.suptitle(title, fontsize=9)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def zonal_mean_plot(
    fields: dict[str, np.ndarray], lats: np.ndarray, ylabel: str, out_path: str
):
    """Zonal-mean profiles per model (physical-soundness figures,
    reference `plot_results.py:318,651`)."""
    fig, ax = plt.subplots(figsize=(4, 3))
    for name, f in fields.items():
        ax.plot(lats, f.mean(axis=-1) if f.ndim > 1 else f, label=name)
    ax.set_xlabel("latitude")
    ax.set_ylabel(ylabel)
    ax.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def metric_over_params_plot(
    scores: dict[str, dict[int, float]],
    out_path: str,
    metric: str = "RMSE",
    broken: dict[str, list[int]] | None = None,
    title: str = "",
):
    """Skill over the parameter ladder (reference
    `plot_results.py:158-316`): one curve per model family over #params,
    log-y, with diverged/broken runs marked as diamonds at their param
    count (the reference's `broken_idcs` scatter, `plot_results.py:470`)."""
    broken = broken or {}
    fig, ax = plt.subplots(figsize=(5, 3.5))
    for model, ladder in scores.items():
        ps = sorted(ladder)
        line, = ax.plot(ps, [ladder[p] for p in ps], marker="o", lw=2,
                        markersize=4, label=model)
        bad = broken.get(model)
        if bad:
            ax.scatter(bad, [ladder[p] for p in bad], c=line.get_color(),
                       marker="d", s=50, zorder=3)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("#parameters")
    ax.set_ylabel(metric)
    ax.grid(visible=True, which="minor", color="silver")
    ax.grid(visible=True, which="major", color="grey")
    if title:
        ax.set_title(title)
    ax.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def end_conditions_plot(
    fields: dict[str, np.ndarray],
    verification: np.ndarray,
    out_path: str,
    day: int = 96,
    var_name: str = "",
):
    """End-of-rollout state snapshots per model next to the verification
    (reference `plot_results.py:572-649`, default day 96): one filled
    contour panel per model at a shared color range."""
    names = ["verification"] + list(fields)
    n = len(names)
    ncol = min(4, n)
    nrow = -(-n // ncol)
    vmin, vmax = np.percentile(verification, [1, 99])
    fig, axes = plt.subplots(nrow, ncol, figsize=(3.2 * ncol, 2.0 * nrow),
                             squeeze=False)
    for i, name in enumerate(names):
        ax = axes[i // ncol][i % ncol]
        arr = verification if name == "verification" else fields[name]
        im = ax.contourf(arr, levels=20, vmin=vmin, vmax=vmax, cmap="RdBu_r")
        ax.set_title(name, fontsize=8)
        ax.set_xticks([])
        ax.set_yticks([])
    for j in range(n, nrow * ncol):
        axes[j // ncol][j % ncol].set_axis_off()
    fig.colorbar(im, ax=axes, shrink=0.8)
    fig.suptitle(f"{var_name} state at day {day}", fontsize=10)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def long_rollout_mean_std_plot(
    series: dict[str, np.ndarray],
    verification: np.ndarray,
    out_path: str,
    timedelta_hours: float = 24.0,
    var_name: str = "",
):
    """Global-mean and global-std drift over a long rollout per model vs
    the verification (reference `plot_results.py:785-923`
    long_rollout_mean_plot/long_rollout_std_plot): the year-long stability
    diagnostic — a sound model's statistics stay near the verification's.

    series[model]: [T, H, W] forecast fields; verification: [T, H, W].
    """
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3))
    days = np.arange(verification.shape[0]) * timedelta_hours / 24.0

    def stats(a):
        flat = a.reshape(a.shape[0], -1)
        return flat.mean(axis=1), flat.std(axis=1)

    vm, vs = stats(verification)
    ax1.plot(days, vm, "k--", lw=2, label="verification")
    ax2.plot(days, vs, "k--", lw=2, label="verification")
    for name, arr in series.items():
        m, s = stats(arr)
        d = np.arange(arr.shape[0]) * timedelta_hours / 24.0
        ax1.plot(d, m, label=name)
        ax2.plot(d, s, label=name)
    ax1.set_ylabel(f"global mean {var_name}")
    ax2.set_ylabel(f"global std {var_name}")
    for ax in (ax1, ax2):
        ax.set_xlabel("lead time [days]")
        ax.grid(color="silver", lw=0.5)
    ax1.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def kinetic_energy_spectrum_plot(
    spectra: dict[str, np.ndarray], out_path: str
):
    """Zonal kinetic-energy spectra overlay (reference `plot_results.py:925`)."""
    fig, ax = plt.subplots(figsize=(4, 3))
    for name, p in spectra.items():
        ax.loglog(np.arange(1, len(p)), p[1:], label=name)
    ax.set_xlabel("zonal wavenumber")
    ax.set_ylabel("energy")
    ax.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
