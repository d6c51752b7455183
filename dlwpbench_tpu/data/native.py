"""ctypes loader for the native C++ window batcher (src/native/*.cpp).

Builds the shared library on first use with g++ (cached next to the source);
falls back to numpy transparently when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "src",
    "native",
    "window_batcher.cpp",
)
_SO = os.path.splitext(_SRC)[0] + ".so"
_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", "-pthread", _SRC, "-o", _SO,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.assemble_windows.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.add_gaussian_noise.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
                ctypes.c_uint64, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def assemble_windows(
    data: np.ndarray, starts: np.ndarray, seq: int, n_threads: int = 4
) -> np.ndarray:
    """data [T, *feat] float32 + starts [B] -> [B, seq, *feat] (native or numpy)."""
    data = np.ascontiguousarray(data, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    T = data.shape[0]
    feat_shape = data.shape[1:]
    F = int(np.prod(feat_shape)) if feat_shape else 1
    B = len(starts)
    assert (starts >= 0).all() and (starts + seq <= T).all()

    lib = _load()
    out = np.empty((B, seq, *feat_shape), np.float32)
    if lib is None:
        for i, s in enumerate(starts):
            out[i] = data[s : s + seq]
        return out
    flat = data.reshape(T, F)
    lib.assemble_windows(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T, F,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, seq,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(n_threads),
    )
    return out


def add_gaussian_noise(
    arr: np.ndarray, noise_std: float, seed: int, n_threads: int = 4
) -> np.ndarray:
    """In-place fused gaussian noise (native), or numpy fallback."""
    if noise_std == 0:
        return arr
    lib = _load()
    if lib is None:
        arr += np.float32(noise_std) * np.random.default_rng(seed).standard_normal(
            arr.shape
        ).astype(np.float32)
        return arr
    assert arr.dtype == np.float32 and arr.flags.c_contiguous
    lib.add_gaussian_noise(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arr.size, float(noise_std), int(seed) & (2**64 - 1), int(n_threads),
    )
    return arr
