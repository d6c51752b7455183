#!/usr/bin/env python
"""netCDF -> zarr tree converter (reference `data/processing/nc_to_zarr.py`).

Requires xarray + zarr, which are not installed in this image; the converter
is provided for environments that have them and fails with a clear message
otherwise.

    python scripts/nc_to_zarr.py src_dir dst_dir
"""

import argparse
import glob
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src_dir")
    ap.add_argument("dst_dir")
    args = ap.parse_args(argv)
    try:
        import xarray as xr
    except ImportError:
        raise SystemExit(
            "nc_to_zarr requires xarray/zarr (not installed in this image)."
        )
    for path in sorted(glob.glob(os.path.join(args.src_dir, "**", "*.nc"),
                                 recursive=True)):
        rel = os.path.relpath(path, args.src_dir)
        dst = os.path.join(args.dst_dir, os.path.splitext(rel)[0] + ".zarr")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        xr.open_dataset(path).to_zarr(dst, mode="w")
        print(f"{path} -> {dst}")


if __name__ == "__main__":
    main()
