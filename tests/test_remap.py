"""HEALPix remap + insolation tests."""

import numpy as np
import pytest


class TestRemap:
    def test_roundtrip_smooth_field(self):
        """ll -> hpx -> ll must reconstruct a smooth field accurately."""
        from dlwpbench_tpu.grids.remap import HEALPixRemap

        nlat, nlon, nside = 32, 64, 16
        rm = HEALPixRemap(nlat, nlon, nside)
        dlat = 180 / nlat
        lats = np.deg2rad(np.linspace(-90 + dlat / 2, 90 - dlat / 2, nlat))
        lons = np.deg2rad(np.linspace(0, 360, nlon, endpoint=False))
        L, P = np.meshgrid(lats, lons, indexing="ij")
        field = (np.sin(2 * L) * np.cos(3 * P) + 2.0).astype(np.float32)

        hpx_map = np.asarray(rm.ll2hpx(field))
        assert hpx_map.shape == (12, nside, nside)
        back = np.asarray(rm.hpx2ll(hpx_map))
        assert back.shape == (nlat, nlon)
        err = np.abs(back - field) / np.abs(field).max()
        assert err.mean() < 0.03 and err.max() < 0.15  # worst rows are the clamped poles

    def test_constant_preserved(self):
        from dlwpbench_tpu.grids.remap import HEALPixRemap

        rm = HEALPixRemap(16, 32, 8)
        ones = np.ones((16, 32), np.float32)
        h = np.asarray(rm.ll2hpx(ones))
        np.testing.assert_allclose(h, 1.0, atol=1e-6)
        back = np.asarray(rm.hpx2ll(h))
        np.testing.assert_allclose(back, 1.0, atol=1e-6)

    def test_batched_channels(self):
        from dlwpbench_tpu.grids.remap import HEALPixRemap

        rm = HEALPixRemap(16, 32, 8)
        x = np.random.default_rng(0).standard_normal((2, 3, 16, 32)).astype(np.float32)
        h = np.asarray(rm.ll2hpx(x))
        assert h.shape == (2, 3, 12, 8, 8)
        back = np.asarray(rm.hpx2ll(h))
        assert back.shape == (2, 3, 16, 32)

    def test_weights_normalized(self):
        from dlwpbench_tpu.grids.remap import build_hpx2ll, build_ll2hpx

        op = build_ll2hpx(32, 64, 8)
        np.testing.assert_allclose(op.w.sum(-1), 1.0, atol=1e-6)
        op2 = build_hpx2ll(8, 32, 64)
        np.testing.assert_allclose(op2.w.sum(-1), 1.0, atol=1e-6)


class TestInsolation:
    def test_basic_properties(self):
        from dlwpbench_tpu.data.insolation import insolation

        dates = np.array(
            ["2017-06-21T12:00", "2017-12-21T12:00"], dtype="datetime64[ns]"
        )
        lat = np.linspace(-87, 87, 32)
        lon = np.linspace(0, 360, 64, endpoint=False)
        sol = insolation(dates, lat, lon)
        assert sol.shape == (2, 32, 64)
        assert (sol >= 0).all() and sol.max() <= 1.5
        # June solstice: northern high latitudes sunnier than southern
        assert sol[0, -4:].mean() > sol[0, :4].mean()
        # December solstice: reversed
        assert sol[1, :4].mean() > sol[1, -4:].mean()

    def test_jax_variant_matches_numpy(self):
        import pandas as pd

        from dlwpbench_tpu.data.insolation import insolation, insolation_jax

        dates = np.array(["2017-03-01T06:00"], dtype="datetime64[ns]")
        lat = np.linspace(-87, 87, 16)
        lon = np.linspace(0, 360, 32, endpoint=False)
        want = insolation(dates, lat, lon)
        doy = (
            np.array(dates, dtype="datetime64[ns]")
            - np.array([pd.Timestamp(2017, 1, 1)], dtype="datetime64[ns]")
        ) / np.timedelta64(1, "D")
        lon2, lat2 = np.meshgrid(lon, lat)
        got = np.asarray(insolation_jax(doy, lat2, lon2))
        np.testing.assert_allclose(got, want, atol=1e-4)
