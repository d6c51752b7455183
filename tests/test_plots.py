"""Smoke tests for the paper-figure families (reference
`scripts/plot_results.py` + `scripts/additional_plot.py` equivalents):
every plot function writes a non-trivial PNG from plain numpy inputs."""

import os

import numpy as np


def _png_ok(path):
    return os.path.exists(path) and os.path.getsize(path) > 2000


class TestPlots:
    def test_multi_x_over_params(self, tmp_path):
        from dlwpbench_tpu.evaluation.plots import multi_x_over_params_plot

        p = str(tmp_path / "a.png")
        multi_x_over_params_plot(
            {"unet": {50_000: 1.0, 1_000_000: 0.8}, "swin": {50_000: 1.2}},
            "RMSE", p)
        assert _png_ok(p)

    def test_metric_over_params_with_broken_runs(self, tmp_path):
        from dlwpbench_tpu.evaluation.plots import metric_over_params_plot

        p = str(tmp_path / "b.png")
        metric_over_params_plot(
            {"unet": {50_000: 1.0, 1_000_000: 0.8, 16_000_000: 0.7},
             "fcn": {50_000: 1.4, 1_000_000: 2.5}},
            p, broken={"fcn": [1_000_000]}, title="Z500, 3 days")
        assert _png_ok(p)

    def test_end_conditions_plot(self, tmp_path):
        from dlwpbench_tpu.evaluation.plots import end_conditions_plot

        rng = np.random.default_rng(0)
        p = str(tmp_path / "c.png")
        end_conditions_plot(
            {"unet": rng.standard_normal((16, 32)),
             "sfno": rng.standard_normal((16, 32))},
            rng.standard_normal((16, 32)), p, day=96, var_name="z500")
        assert _png_ok(p)

    def test_long_rollout_mean_std(self, tmp_path):
        from dlwpbench_tpu.evaluation.plots import long_rollout_mean_std_plot

        rng = np.random.default_rng(1)
        p = str(tmp_path / "d.png")
        long_rollout_mean_std_plot(
            {"unet": rng.standard_normal((20, 8, 16))},
            rng.standard_normal((20, 8, 16)), p, timedelta_hours=24.0,
            var_name="z500")
        assert _png_ok(p)

    def test_gridpoint_and_panels(self, tmp_path):
        from dlwpbench_tpu.evaluation.plots import (
            output_vs_target_plot,
            rmse_per_gridpoint_plot,
        )

        rng = np.random.default_rng(2)
        out = rng.standard_normal((2, 5, 8, 16))
        tar = rng.standard_normal((2, 5, 8, 16))
        p1, p2 = str(tmp_path / "e.png"), str(tmp_path / "f.png")
        rmse_per_gridpoint_plot(out, tar, p1)
        output_vs_target_plot(out[0, 0], tar[0, 0], p2)
        assert _png_ok(p1) and _png_ok(p2)

    def test_zonal_and_spectrum(self, tmp_path):
        from dlwpbench_tpu.evaluation.plots import (
            kinetic_energy_spectrum_plot,
            zonal_mean_plot,
        )

        rng = np.random.default_rng(3)
        p1, p2 = str(tmp_path / "g.png"), str(tmp_path / "h.png")
        zonal_mean_plot({"unet": rng.standard_normal((8, 16))},
                        np.linspace(-80, 80, 8), "u10", p1)
        kinetic_energy_spectrum_plot({"unet": np.abs(rng.standard_normal(16))}, p2)
        assert _png_ok(p1) and _png_ok(p2)

    def test_zonal_wave_figure_family(self, tmp_path):
        """Reference preprocessing.py:595-683: Hovmoller, per-time zonal FFT
        amplitude overlay, per-wavenumber amplitude distribution, GIF."""
        from dlwpbench_tpu.data.preprocessing import zonal_wave_analysis
        from dlwpbench_tpu.evaluation.plots import (
            hovmoller_plot,
            make_gif,
            zonal_fft_amplitude_plot,
            zonal_wavenumber_distribution_plot,
        )

        rng = np.random.default_rng(4)
        T, H, W = 40, 8, 16
        times = (np.datetime64("2015-01-01T00") +
                 np.arange(T) * np.timedelta64(6, "h"))
        lats = np.linspace(-87.5, 87.5, H)
        data = rng.standard_normal((T, H, W)).astype(np.float32)
        res = zonal_wave_analysis(data, times, lats, freq="D",
                                  lat_band=(30.0, 60.0))
        assert res["series"].shape[-1] == W
        assert res["amplitude_spectrum"].shape == res["series"].shape

        p1 = str(tmp_path / "hov.png")
        p2 = str(tmp_path / "amp.png")
        p3 = str(tmp_path / "dist.png")
        hovmoller_plot(res["series"], np.arange(W) * 22.5, p1, var="z500")
        zonal_fft_amplitude_plot(res["amplitude_spectrum"], p2,
                                 time_indices=(0, 1))
        zonal_wavenumber_distribution_plot(res["amplitude_spectrum"], p3)
        assert _png_ok(p1) and _png_ok(p2) and _png_ok(p3)

        g = str(tmp_path / "anim.gif")
        make_gif(data[:4], g, fps=2, var="z500")
        with open(g, "rb") as f:
            assert f.read(6) in (b"GIF87a", b"GIF89a")

    def test_preprocessor_accessors(self):
        from dlwpbench_tpu.data.preprocessing import Preprocessor

        rng = np.random.default_rng(5)
        T = 30
        times = (np.datetime64("2015-01-01") +
                 np.arange(T) * np.timedelta64(1, "D"))
        data = rng.standard_normal((T, 4, 6)).astype(np.float32)
        pp = Preprocessor(rolling_window_size=None, detrend="linear")
        import pytest
        with pytest.raises(RuntimeError):
            _ = pp.trend
        pp.fit(data, times)
        assert pp.trend.shape == (2, 4, 6)       # [deg+1, ...]
        assert pp.climatology.shape == (366, 4, 6)
