#!/usr/bin/env python
"""Lat-lon <-> HEALPix remap CLI (reference `data/processing/healpix_mapping.py`
CLI, `:615-640`) operating on .npy/.npz arrays (xarray-free).

    python scripts/remap_healpix.py ll2hpx input.npy output.npy --nside 8
    python scripts/remap_healpix.py hpx2ll input.npy output.npy --nlat 32 --nlon 64
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("direction", choices=["ll2hpx", "hpx2ll"])
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--nside", type=int, default=8)
    ap.add_argument("--nlat", type=int, default=32)
    ap.add_argument("--nlon", type=int, default=64)
    args = ap.parse_args(argv)

    from dlwpbench_tpu.grids.remap import HEALPixRemap

    data = np.load(args.input)
    if hasattr(data, "files"):  # npz
        data = data[data.files[0]]
    if args.direction == "ll2hpx":
        nlat, nlon = data.shape[-2:]
        rm = HEALPixRemap(nlat, nlon, args.nside)
        out = np.asarray(rm.ll2hpx(data))
    else:
        nside = data.shape[-1]
        rm = HEALPixRemap(args.nlat, args.nlon, nside)
        out = np.asarray(rm.hpx2ll(data))
    np.save(args.output, out)
    print(f"{args.direction}: {data.shape} -> {out.shape} -> {args.output}")


if __name__ == "__main__":
    main()
