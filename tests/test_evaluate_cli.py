"""scripts/evaluate.py end-to-end: train (CLI) -> evaluate (CLI).

The reference's evaluation pipeline is its de-facto test suite (SURVEY §4);
here the CLI itself is under test — including the two paths a unit test of
`evaluation/` cannot see: physical-unit denormalization of the rollout and
the HEALPix→lat-lon remap branch.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _train(tmp_path, name, *overrides):
    import importlib

    train = importlib.import_module("train")
    run_dir = os.path.join(str(tmp_path), name)
    train.main([
        "training.epochs=1", "training.batch_size=2",
        "training.sequence_length=3", "validation.sequence_length=3",
        f"run_dir={run_dir}", "verbose=false", *overrides,
    ])
    return run_dir


class TestEvaluateCLI:
    def test_latlon_run_physical_units(self, tmp_path, monkeypatch):
        """Metrics come out DE-NORMALIZED: the synthetic source z-scores
        with the group std, so physical-unit RMSEs must be ~std(field)
        times the normalized ones, and forecast files must exist."""
        import importlib

        monkeypatch.chdir(tmp_path)  # comparison plot writes ./outputs
        run_dir = _train(
            tmp_path, "ll", "model=unet", "data=synthetic",
            "data.height=16", "data.width=32", "model.hidden_channels=[6]",
        )
        ev = importlib.import_module("evaluate")
        results = ev.evaluate_run(
            run_dir, sequence_length=5, batch_size=4, video=False
        )
        out_dir = os.path.join(run_dir, "evaluation")
        m = json.load(open(os.path.join(out_dir, "metrics.json")))
        rmse0 = np.asarray(m["rmse"][m["variables"][0]])
        assert np.isfinite(rmse0).all() and (rmse0 > 0).all()
        # the synthetic prognostic fields have O(1..10) physical std; a
        # barely-trained net forecast in PHYSICAL units has RMSE well above
        # the ~0.05-0.5 z-unit range the old normalized metrics sat in
        from dlwpbench_tpu.data.sources import build_datasets
        from dlwpbench_tpu.training.config import load_saved_config

        cfg = load_saved_config(run_dir)
        *_, stats = build_datasets(
            cfg.data, cfg.training, cfg.validation, cfg.get("testing"), 1
        )
        std = next(iter(stats.values())).std
        assert rmse0.mean() > 0.05 * std
        # real netCDF artifacts in this image (reference evaluate.py:320-416
        # writes inits/outputs/targets.nc; rmses.nc at :797-803) — the
        # first-party scipy-netCDF3 writer runs when xarray is absent
        from dlwpbench_tpu.utils.netcdf3 import read_dataset

        data, dims = read_dataset(os.path.join(out_dir, "outputs.nc"))
        v0 = m["variables"][0]
        assert dims[v0] == ("sample", "time", "lat", "lon")
        assert data[v0].ndim == 4 and np.isfinite(data[v0]).all()
        assert data["lat"].shape[0] == data[v0].shape[2]
        for stem in ("inits", "targets", "rmses"):
            assert os.path.exists(os.path.join(out_dir, f"{stem}.nc")), stem
        rm, _ = read_dataset(os.path.join(out_dir, "rmses.nc"))
        np.testing.assert_allclose(rm[v0], rmse0, rtol=1e-6)

    def test_healpix_run_remaps_to_latlon(self, tmp_path, monkeypatch):
        """The HPX branch executes: 6-D rollout output is remapped to
        lat-lon before files/metrics (reference evaluate.py:298-304)."""
        import importlib

        monkeypatch.chdir(tmp_path)
        run_dir = _train(
            tmp_path, "hpx", "model=unet_hpx", "data=synthetic_hpx8",
            "model.hidden_channels=[6]",
        )
        ev = importlib.import_module("evaluate")
        results = ev.evaluate_run(
            run_dir, sequence_length=4, batch_size=4, video=False
        )
        out_dir = os.path.join(run_dir, "evaluation")
        m = json.load(open(os.path.join(out_dir, "metrics.json")))
        assert all(np.isfinite(v).all() for v in m["rmse"].values())
        from dlwpbench_tpu.utils.netcdf3 import read_dataset

        data, dims = read_dataset(os.path.join(out_dir, "outputs.nc"))
        v0 = m["variables"][0]
        # lat-lon dims: faces remapped away before writing
        assert dims[v0] == ("sample", "time", "lat", "lon")


class TestBaselinesCLI:
    def test_build_baselines_and_acc(self, tmp_path, monkeypatch):
        """build_baselines writes persistence+climatology in physical
        units; a following evaluate_run picks the climatology file up and
        emits ACC (eq. A1) against it."""
        import importlib

        monkeypatch.chdir(tmp_path)
        run_dir = _train(
            tmp_path, "bb", "model=unet", "data=synthetic",
            "data.height=16", "data.width=32", "model.hidden_channels=[6]",
        )
        bb = importlib.import_module("build_baselines")
        bb.main(["-c", run_dir, "--sequence-length", "5"])
        for name in ("persistence", "climatology"):
            m = json.load(open(os.path.join(
                "outputs", name, "evaluation", "metrics.json")))
            assert all(np.isfinite(v).all() for v in m["rmse"].values())
        assert os.path.exists(os.path.join(
            "outputs", "climatology", "evaluation", "outputs.npz"))

        ev = importlib.import_module("evaluate")
        results = ev.evaluate_run(
            run_dir, sequence_length=5, batch_size=4, video=False
        )
        assert "acc" in results  # climatology consumed -> eq. A1 computed
        acc0 = np.asarray(results["acc"][results["variables"][0]])
        assert np.isfinite(acc0).all() and (np.abs(acc0) <= 1.0 + 1e-6).all()


class TestPaperFiguresCLI:
    def test_paper_figures_from_eval_artifacts(self, tmp_path, monkeypatch):
        """scripts/paper_figures.py renders the reference's figure families
        (plot_results.py) from measured evaluation artifacts."""
        import importlib

        monkeypatch.chdir(tmp_path)
        run_dir = _train(
            tmp_path, "figs", "model=unet", "data=synthetic",
            "data.height=16", "data.width=32", "model.hidden_channels=[6]",
        )
        ev = importlib.import_module("evaluate")
        ev.evaluate_run(run_dir, sequence_length=5, batch_size=4, video=False)
        pf = importlib.import_module("paper_figures")
        out = str(tmp_path / "figures")
        pf.main(["-c", run_dir, "--out-dir", out])
        made = sorted(os.listdir(out))
        for stem in ("rmse_over_time", "physical_soundness", "hovmoller",
                     "ke_spectrum", "end_conditions", "long_rollout",
                     "zonal_fft", "wavenumber_dist", "rmse_map"):
            assert any(f.startswith(stem) for f in made), (stem, made)
