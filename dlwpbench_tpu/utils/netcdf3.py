"""First-party classic-netCDF3 dataset writer (scipy backend).

The reference emits `inits/outputs/targets.nc`, `rmses.nc`, `accs.nc` via
xarray (`/root/reference/src/dlwpbench/scripts/evaluate.py:320-416,797-803`).
This image has no xarray, but scipy's `netcdf_file` writes classic
netCDF3 — enough for every artifact the evaluation pipeline produces
(float arrays over named dims with coordinate variables).  This module is
the write-side twin of the scipy fallback reader in `scripts/nc_to_zarr.py`.

netCDF3-classic constraints handled here:
- no int64/uint types: integer data is downcast to int32;
- float16/bfloat16 are not representable: upcast to float32;
- one unlimited dim max: all dims are written as fixed-size.
"""

from __future__ import annotations

import numpy as np


def _nc3_dtype(arr: np.ndarray) -> np.ndarray:
    """Coerce an array to a dtype classic netCDF3 can store."""
    dt = arr.dtype
    if dt.kind in "ui":
        return arr.astype(np.int32) if dt.itemsize > 4 or dt.kind == "u" else arr
    if dt.kind == "f" and dt.itemsize < 4:
        return arr.astype(np.float32)
    if dt.kind == "f" and dt.itemsize > 8:
        return arr.astype(np.float64)
    if dt.kind not in "uif":
        raise TypeError(f"netCDF3 cannot store dtype {dt}")
    return arr


def write_dataset(
    path: str,
    data_vars: dict[str, tuple[tuple[str, ...], np.ndarray]],
    coords: dict[str, np.ndarray] | None = None,
    attrs: dict[str, str] | None = None,
) -> None:
    """Write `{name: (dims, array)}` + coordinate variables as netCDF3.

    Mirrors `xr.Dataset(data_vars, coords).to_netcdf(path)` for the subset
    the evaluation pipeline needs.  Dim sizes are inferred from the first
    variable using each dim; mismatches raise.
    """
    from scipy.io import netcdf_file

    coords = coords or {}
    dim_sizes: dict[str, int] = {}
    for name, (dims, arr) in data_vars.items():
        arr = np.asarray(arr)
        if len(dims) != arr.ndim:
            raise ValueError(
                f"{name}: {len(dims)} dims for array of rank {arr.ndim}"
            )
        for d, s in zip(dims, arr.shape):
            if dim_sizes.setdefault(d, s) != s:
                raise ValueError(
                    f"dim {d!r}: size {s} in {name} != {dim_sizes[d]}"
                )
    for cname, cvals in coords.items():
        cvals = np.asarray(cvals)
        if dim_sizes.setdefault(cname, cvals.shape[0]) != cvals.shape[0]:
            raise ValueError(
                f"coord {cname!r}: length {cvals.shape[0]} != dim size "
                f"{dim_sizes[cname]}"
            )

    with netcdf_file(path, "w", version=2) as f:  # v2 = 64-bit offsets
        for attr, val in (attrs or {}).items():
            setattr(f, attr, val)
        for d, s in dim_sizes.items():
            f.createDimension(d, s)
        for cname, cvals in coords.items():
            cvals = _nc3_dtype(np.asarray(cvals))
            v = f.createVariable(cname, cvals.dtype, (cname,))
            v[:] = cvals
        for name, (dims, arr) in data_vars.items():
            arr = _nc3_dtype(np.ascontiguousarray(arr))
            v = f.createVariable(name, arr.dtype, tuple(dims))
            v[:] = arr


def read_dataset(path: str) -> tuple[dict[str, np.ndarray], dict[str, tuple]]:
    """Read back `{name: array}` + `{name: dims}` (test/consumer helper).

    Copies out of the mmap so the file handle can close safely.
    """
    from scipy.io import netcdf_file

    data: dict[str, np.ndarray] = {}
    dims: dict[str, tuple] = {}
    with netcdf_file(path, "r", mmap=False) as f:
        for name, var in f.variables.items():
            arr = np.array(var[:])
            # netCDF3 is big-endian on disk; hand back native-order arrays
            data[name] = arr.astype(arr.dtype.newbyteorder("="))
            dims[name] = tuple(var.dimensions)
    return data, dims
