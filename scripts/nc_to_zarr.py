#!/usr/bin/env python
"""netCDF -> zarr tree converter (reference `data/processing/nc_to_zarr.py`).

Prefers xarray+zarr when installed (full netCDF4/HDF5 support); otherwise
falls back to first-party IO — classic netCDF3 via `scipy.io.netcdf_file`
written out with `data/zarr_lite.py` — so the converter executes in this
image (netCDF4 files need the xarray path; the fallback says so clearly).

    python scripts/nc_to_zarr.py src_dir dst_dir
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _convert_xarray(path, dst):
    import xarray as xr

    xr.open_dataset(path).to_zarr(dst, mode="w")


def _convert_scipy(path, dst):
    """Classic netCDF3 -> zarr via zarr_lite (CF attrs preserved)."""
    import numpy as np
    from scipy.io import netcdf_file

    from dlwpbench_tpu.data import zarr_lite

    with netcdf_file(path, mmap=False) as f:
        dim_names = set(f.dimensions)
        data_vars, coords = {}, {}
        for name, var in f.variables.items():
            dims = tuple(var.dimensions)
            attrs = {
                k: (v.decode() if isinstance(v, bytes) else v)
                for k, v in var._attributes.items()
            }
            arr = np.asarray(var[:])
            if name in dim_names:
                coords[name] = (dims, arr, attrs)
            else:
                data_vars[name] = (dims, arr)
        zarr_lite.write_dataset(dst, data_vars, coords)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src_dir")
    ap.add_argument("dst_dir")
    args = ap.parse_args(argv)
    try:
        import xarray  # noqa: F401

        convert = _convert_xarray
    except ImportError:
        convert = _convert_scipy
    n = 0
    for path in sorted(glob.glob(os.path.join(args.src_dir, "**", "*.nc"),
                                 recursive=True)):
        rel = os.path.relpath(path, args.src_dir)
        dst = os.path.join(args.dst_dir, os.path.splitext(rel)[0] + ".zarr")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            convert(path, dst)
        except TypeError as e:
            raise SystemExit(
                f"{path}: not a classic netCDF3 file; converting "
                "netCDF4/HDF5 requires xarray (not in this image)"
            ) from e
        print(f"{path} -> {dst}")
        n += 1
    print(f"converted {n} files")


if __name__ == "__main__":
    main()
