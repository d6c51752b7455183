"""First-party classic-netCDF3 writer (utils/netcdf3.py).

The reference emits its evaluation artifacts as netCDF via xarray
(`/root/reference/src/dlwpbench/scripts/evaluate.py:320-416,797-803`);
this image has no xarray, so the scipy-backed writer must produce real
.nc files that any netCDF reader can open.
"""

from __future__ import annotations

import numpy as np
import pytest

from dlwpbench_tpu.utils import netcdf3


class TestNetcdf3Writer:
    def test_roundtrip_with_coords(self, tmp_path):
        path = str(tmp_path / "ds.nc")
        rng = np.random.default_rng(0)
        out = rng.normal(size=(3, 5, 4, 8)).astype(np.float32)
        lat = np.linspace(-87.1875, 87.1875, 4)
        lon = np.arange(8) * 45.0
        netcdf3.write_dataset(
            path,
            {"z500": (("sample", "time", "lat", "lon"), out)},
            coords={"lat": lat, "lon": lon},
            attrs={"title": "forecast"},
        )
        data, dims = netcdf3.read_dataset(path)
        np.testing.assert_array_equal(data["z500"], out)
        assert dims["z500"] == ("sample", "time", "lat", "lon")
        np.testing.assert_allclose(data["lat"], lat)
        np.testing.assert_allclose(data["lon"], lon)

    def test_scipy_independent_read(self, tmp_path):
        """The file is genuine netCDF3: a fresh scipy handle (the same
        library any external consumer would use) reads it back with the
        declared dimensions."""
        from scipy.io import netcdf_file

        path = str(tmp_path / "m.nc")
        vals = np.arange(7, dtype=np.float64)
        netcdf3.write_dataset(path, {"rmse": (("time",), vals)})
        with netcdf_file(path, "r", mmap=False) as f:
            assert f.dimensions["time"] == 7
            np.testing.assert_array_equal(np.array(f.variables["rmse"][:]), vals)

    def test_dtype_coercion(self, tmp_path):
        """netCDF3-classic has no int64/float16 — coerced, values intact."""
        path = str(tmp_path / "d.nc")
        netcdf3.write_dataset(
            path,
            {
                "i": (("n",), np.arange(4, dtype=np.int64)),
                "h": (("n",), np.ones(4, dtype=np.float16) * 0.5),
            },
        )
        data, _ = netcdf3.read_dataset(path)
        assert data["i"].dtype == np.int32
        np.testing.assert_array_equal(data["i"], np.arange(4))
        assert data["h"].dtype == np.float32
        np.testing.assert_allclose(data["h"], 0.5)

    def test_dim_mismatch_raises(self, tmp_path):
        with pytest.raises(ValueError, match="dim"):
            netcdf3.write_dataset(
                str(tmp_path / "bad.nc"),
                {
                    "a": (("x",), np.zeros(3)),
                    "b": (("x",), np.zeros(4)),
                },
            )

    def test_rank_mismatch_raises(self, tmp_path):
        with pytest.raises(ValueError, match="rank"):
            netcdf3.write_dataset(
                str(tmp_path / "bad.nc"),
                {"a": (("x", "y"), np.zeros(3))},
            )
