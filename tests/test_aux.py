"""Aux subsystem tests: module checkpoints, preprocessing, regrid, logging."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestModuleCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        from dlwpbench_tpu.models.unet import UNet
        from dlwpbench_tpu.training.module_checkpoint import (
            load_module_checkpoint,
            save_module_checkpoint,
        )

        m = UNet(
            constant_channels=1,
            prescribed_channels=0,
            prognostic_channels=2,
            hidden_channels=(4,),
            context_size=1,
        )
        prog = jnp.ones((1, 3, 2, 8, 16))
        params = m.init(jax.random.PRNGKey(0), None, None, prog)
        path = str(tmp_path / "unet.mdlus.zip")
        save_module_checkpoint(path, m, params)

        m2, p2 = load_module_checkpoint(path)
        assert type(m2).__name__ == "UNet"
        assert m2.hidden_channels == (4,)
        out1 = np.asarray(m.apply(params, None, None, prog))
        out2 = np.asarray(m2.apply(p2, None, None, prog))
        np.testing.assert_allclose(out1, out2, atol=1e-7)

    def test_bad_format_rejected(self, tmp_path):
        import json
        import zipfile

        from dlwpbench_tpu.training.module_checkpoint import load_module_checkpoint

        path = str(tmp_path / "bad.zip")
        with zipfile.ZipFile(path, "w") as z:
            z.writestr("metadata.json", json.dumps({"format": "other"}))
            z.writestr("params.msgpack", b"")
        with pytest.raises(ValueError, match="unsupported"):
            load_module_checkpoint(path)


class TestPreprocessor:
    def test_linear_detrend_roundtrip(self):
        from dlwpbench_tpu.data.preprocessing import Preprocessor

        T = 400
        times = np.arange("2000-01-01", "2001-02-04", dtype="datetime64[D]")[:T]
        rng = np.random.default_rng(0)
        trend = 0.01 * np.arange(T)[:, None, None]
        data = trend + rng.standard_normal((T, 4, 8)) * 0.1

        pp = Preprocessor(detrend="linear", subtract_climatology=False).fit(
            data, times
        )
        anom = pp.transform(data, times)
        # trend removed: temporal slope ~ 0
        slope = np.polyfit(np.arange(T), anom.reshape(T, -1).mean(1), 1)[0]
        assert abs(slope) < 1e-4
        back = pp.inverse_transform(anom, times)
        np.testing.assert_allclose(back, data, atol=1e-4)

    def test_climatology_removed(self):
        from dlwpbench_tpu.data.preprocessing import Preprocessor

        times = np.arange("2000-01-01", "2004-01-01", dtype="datetime64[D]")
        T = len(times)
        doy = (times - times.astype("datetime64[Y]")).astype(int)
        seasonal = np.sin(2 * np.pi * doy / 365.25)[:, None]
        data = seasonal + 0.01 * np.random.default_rng(1).standard_normal((T, 3))
        pp = Preprocessor(detrend=None, rolling_window_size=None).fit(data, times)
        anom = pp.transform(data, times)
        assert np.abs(anom).std() < 0.2 * np.abs(data).std()

    def test_spectrum(self):
        from dlwpbench_tpu.data.preprocessing import temporal_power_spectrum

        t = np.arange(256)
        sig = np.sin(2 * np.pi * t / 16)[:, None]  # period 16 steps = 4 days
        f, p = temporal_power_spectrum(sig, dt_hours=6.0)
        assert f[np.argmax(p[1:]) + 1] == pytest.approx(0.25, rel=1e-6)


class TestRegrid:
    def test_identity(self):
        from dlwpbench_tpu.data.preprocessing import regrid_linear

        lats = np.linspace(-87, 87, 16)
        lons = np.linspace(0, 360, 32, endpoint=False)
        x = np.random.default_rng(0).standard_normal((3, 16, 32)).astype(np.float32)
        y = regrid_linear(x, lats, lons, lats, lons)
        np.testing.assert_allclose(y, x, atol=1e-6)

    def test_downscale_smooth(self):
        from dlwpbench_tpu.data.preprocessing import coarsen_mean, regrid_linear

        lats1 = np.linspace(-89, 89, 64)
        lons1 = np.linspace(0, 360, 128, endpoint=False)
        lats2 = np.linspace(-87, 87, 32)
        lons2 = np.linspace(0, 360, 64, endpoint=False)
        L, P = np.meshgrid(np.deg2rad(lats1), np.deg2rad(lons1), indexing="ij")
        f = np.sin(2 * L) * np.cos(3 * P)
        g = regrid_linear(f, lats1, lons1, lats2, lons2)
        L2, P2 = np.meshgrid(np.deg2rad(lats2), np.deg2rad(lons2), indexing="ij")
        want = np.sin(2 * L2) * np.cos(3 * P2)
        assert np.abs(g - want).max() < 0.02
        c = coarsen_mean(f, 2)
        assert c.shape == (32, 64)


class TestLoggerAndProfiling:
    def test_jsonl_logger(self, tmp_path):
        import json

        from dlwpbench_tpu.utils.logging import RunLogger

        lg = RunLogger(str(tmp_path))
        lg.log({"loss": 0.5}, step=1)
        lg.log({"loss": 0.25, "note": "ok"}, step=2)
        lg.close()
        lines = [json.loads(l) for l in open(lg.path)]
        assert lines[0]["loss"] == 0.5 and lines[1]["_step"] == 2

    def test_step_timer(self):
        from dlwpbench_tpu.utils.profiling import StepTimer

        t = StepTimer(skip=1)
        for _ in range(4):
            with t:
                pass
        s = t.summary()
        assert s["steps"] == 3 and s["mean_s"] >= 0


class TestZonalWaveAnalysis:
    """Reference daily/weekly_preprocessing equivalents
    (`preprocessing.py:507-594`): deseasonalize -> resample -> band mean ->
    zonal FFT amplitude + phase-speed table."""

    def _data(self, days=120, H=8, W=16):
        times = (np.datetime64("2015-01-01T00") +
                 np.arange(days * 4) * np.timedelta64(6, "h"))
        lats = np.linspace(-70, 70, H)
        lons = np.arange(W) * (360.0 / W)
        # wavenumber-3 wave in the 40-50N band whose amplitude varies
        # stochastically in time (a constant wave would be absorbed into
        # the day-of-year climatology, correctly), plus a linear trend
        t = np.arange(len(times), dtype=float)
        amp = 5.0 * (1 + np.random.default_rng(0).standard_normal(len(times)))
        field = (
            amp[:, None, None]
            * np.sin(3 * np.deg2rad(lons))[None, None, :]
            * np.exp(-((lats[:, None] - 45.0) / 8.0) ** 2)[None]
            + 0.01 * t[:, None, None]
        )
        return field.astype(np.float32), times, lats

    def test_daily_amplitude_peak_at_wavenumber_3(self):
        from dlwpbench_tpu.data.preprocessing import zonal_wave_analysis

        data, times, lats = self._data()
        res = zonal_wave_analysis(data, times, lats, freq="D",
                                  lat_band=(40, 50))
        assert res["series"].shape == (120, 16)
        amp = res["amplitude_spectrum"].mean(axis=0)
        assert np.argmax(amp[1:8]) + 1 == 3  # peak at zonal wavenumber 3
        assert res["phase_speed"].shape == (
            len(res["frequencies"]), len(res["wavenumbers"]))

    def test_weekly_resample_and_winter_mask(self):
        from dlwpbench_tpu.data.preprocessing import (
            resample_mean,
            zonal_wave_analysis,
        )

        data, times, lats = self._data(days=400)
        binned, bt = resample_mean(data, times, freq="W")
        assert 56 <= len(bt) <= 59  # ~400/7 weeks
        res = zonal_wave_analysis(data, times, lats, freq="D",
                                  winter_mask=True, lat_band=(40, 50))
        months = (res["times"].astype("datetime64[M]").astype(int) % 12) + 1
        assert set(months.tolist()) <= {12, 1, 2}

    def test_fit_transform_and_trend_series(self):
        from dlwpbench_tpu.data.preprocessing import Preprocessor

        times = (np.datetime64("2015-01-01") +
                 np.arange(200) * np.timedelta64(1, "D"))
        rng = np.random.default_rng(0)
        data = 0.05 * np.arange(200)[:, None] + rng.standard_normal((200, 4))
        pp = Preprocessor(rolling_window_size=None, detrend="linear",
                          subtract_climatology=False)
        anom = pp.fit_transform(data, times)
        # detrended series has no linear component left
        slope = np.polyfit(np.arange(200), anom.mean(axis=1), 1)[0]
        assert abs(slope) < 1e-6
        trend = pp.get_trend_timeseries(200)
        np.testing.assert_allclose(trend + anom, data, atol=1e-4)


class TestProfileCLI:
    def test_profile_model_cli(self, tmp_path):
        """scripts/profile_model.py captures a trace dir + profile.json with
        steady-state percentiles and scan-aware FLOPs."""
        import json
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "..", "scripts"))
        import importlib

        pm = importlib.import_module("profile_model")
        out = str(tmp_path / "trace")
        pm.main(["--model", "unet", "--batch", "1", "--seq", "4",
                 "--steps", "2", "--out-dir", out])
        info = json.load(open(os.path.join(out, "profile.json")))
        assert info["steps"] == 2 and info["median_s"] > 0
        assert info["flops_per_step"] > 0


class TestScheduleAudit:
    def test_audit_entry_independence(self):
        """The HLO dependency auditor (scripts/schedule_audit.py) counts
        dot-class compute that is neither ancestor nor descendant of each
        collective — the schedulable overlap window."""
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "..", "scripts"))
        import importlib

        sa = importlib.import_module("schedule_audit")
        hlo = """
HloModule m

%helper (a: f32[4]) -> f32[4] {
  %a = f32[4] parameter(0)
  ROOT %d = f32[4] dot(%a, %a)
}

ENTRY %main (p0: f32[4], p1: f32[4]) {
  %p0 = f32[4] parameter(0)
  %p1 = f32[4] parameter(1)
  %cp = f32[4] collective-permute(%p0), channel_id=1
  %indep = f32[4] dot(%p1, %p1)
  %dep = f32[4] dot(%cp, %cp)
  %fus = f32[4] fusion(%p1), kind=kLoop, calls=%helper
  ROOT %sum = f32[4] add(%dep, %fus)
}
"""
        res = sa.audit_entry(hlo)
        assert res["n_collectives"] == 1
        row = res["collectives"][0]
        # %indep and %fus are schedulable inside the permute window;
        # %dep is a descendant
        assert row["independent_compute_ops"] == 2
        assert row["descendant_compute_ops"] == 1
        assert res["n_collectives_with_zero_overlap_window"] == 0

    def test_serial_chain_detected(self):
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "..", "scripts"))
        import importlib

        sa = importlib.import_module("schedule_audit")
        hlo = """
HloModule m

ENTRY %main (p0: f32[4]) {
  %p0 = f32[4] parameter(0)
  %d0 = f32[4] dot(%p0, %p0)
  %cp = f32[4] collective-permute(%d0), channel_id=1
  ROOT %d1 = f32[4] dot(%cp, %cp)
}
"""
        res = sa.audit_entry(hlo)
        assert res["n_collectives_with_zero_overlap_window"] == 1
