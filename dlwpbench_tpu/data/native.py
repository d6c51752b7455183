"""ctypes loader for the native C++ window batcher (src/native/*.cpp).

Builds the shared library on first use with g++ (cached next to the source);
falls back to numpy transparently when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import platform
import subprocess
import threading

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "src",
    "native",
    "window_batcher.cpp",
)
_lock = threading.Lock()
_lib = None
_failed = False


def _so_path(src: str) -> str:
    """-march=native output keyed per machine arch: on a shared filesystem
    another host must not dlopen instructions its CPU lacks."""
    return f"{os.path.splitext(src)[0]}.{platform.machine()}.so"


def _build(src: str, so: str, extra: list[str] = ()):  # noqa: B006
    """Compile to a temp file then os.rename (atomic on POSIX): a process
    must never dlopen a half-written .so from a concurrent builder (the
    threading.Lock is per-process only)."""
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return
    tmp = f"{so}.tmp.{os.getpid()}"
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         "-pthread", src, "-o", tmp, *extra],
        check=True,
        capture_output=True,
    )
    os.rename(tmp, so)


_SO = _so_path(_SRC)


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            _build(_SRC, _SO)
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
    # hard error, not assert: this is the ONLY bounds check before an
    # unchecked C++ memcpy, and python -O strips asserts
    if B and not ((starts >= 0).all() and (starts + seq <= T).all()):
        raise ValueError(
            f"window out of bounds: starts in [{starts.min()}, "
            f"{starts.max()}], seq {seq}, T {T}"
        )

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


# ---------------------------------------------------------------------------
# Native zarr chunk decoder (src/native/zarr_decoder.cpp): multithreaded
# file-read + zlib-inflate into a chunk arena, GIL-free.  zarr_lite uses it
# for multi-chunk arrays; edge-chunk trimming stays vectorized numpy.
# ---------------------------------------------------------------------------

_ZSRC = os.path.join(os.path.dirname(_SRC), "zarr_decoder.cpp")
_ZSO = _so_path(_ZSRC)
_zlib_handle = None
_zfailed = False


def _zload():
    global _zlib_handle, _zfailed
    if _zlib_handle is not None or _zfailed:
        return _zlib_handle
    with _lock:
        if _zlib_handle is not None or _zfailed:
            return _zlib_handle
        try:
            _build(_ZSRC, _ZSO, ["-lz"])
            lib = ctypes.CDLL(_ZSO)
            lib.decode_zarr_chunks.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ]
            _zlib_handle = lib
        except Exception:
            _zfailed = True
        return _zlib_handle


def zarr_decoder_available() -> bool:
    return _zload() is not None


def decode_chunks(
    paths: list, compressed: bool, chunk_nbytes: int, n_threads: int = 8
):
    """Read+decode chunk files in parallel -> (arena [n, chunk_nbytes] uint8,
    ok [n] bool).  Returns None when the native decoder is unavailable."""
    lib = _zload()
    if lib is None:
        return None
    enc = [p.encode() for p in paths]
    offsets = np.zeros(len(enc), np.int64)
    pos = 0
    blob = bytearray()
    for i, e in enumerate(enc):
        offsets[i] = pos
        blob += e + b"\0"
        pos += len(e) + 1
    arena = np.empty((len(enc), chunk_nbytes), np.uint8)
    ok = np.zeros(len(enc), np.uint8)
    comp = np.full(len(enc), 1 if compressed else 0, np.uint8)
    lib.decode_zarr_chunks(
        bytes(blob),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(enc),
        comp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arena.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(chunk_nbytes),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(n_threads),
    )
    return arena, ok.astype(bool)
