"""ctypes bridge to the C++ host runtime (`native/fls_native.cpp`).

Builds the shared library on first use if it's missing (g++ is in the
image); every entry point has a pure-numpy fallback so the package works
without a toolchain. The native layer owns latency-critical host I/O:
batched .bin decode, background scan prefetch, binary-PCD fast path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "fls_native.cpp")
_SO = os.path.join(_REPO, "native", "libfls_native.so")

_lib = None
_lock = threading.Lock()


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) and os.path.exists(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True,
                )
            except Exception:
                return None
        if not os.path.exists(_SO):
            return None
        lib = ctypes.CDLL(_SO)
        lib.fls_read_bin.restype = ctypes.c_int
        lib.fls_read_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int
        ]
        lib.fls_read_bins.restype = ctypes.c_int
        lib.fls_read_bins.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.fls_read_bins_q16.restype = ctypes.c_int
        lib.fls_read_bins_q16.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ]
        lib.fls_prefetcher_create.restype = ctypes.c_void_p
        lib.fls_prefetcher_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int
        ]
        lib.fls_prefetcher_next.restype = ctypes.c_int
        lib.fls_prefetcher_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
        ]
        lib.fls_prefetcher_destroy.restype = None
        lib.fls_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        lib.fls_read_pcd_xyz.restype = ctypes.c_int
        lib.fls_read_pcd_xyz.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_bin(path: str, capacity: int):
    """One KITTI .bin -> padded (capacity, 4) float32 + count."""
    lib = _load()
    out = np.empty((capacity, 4), np.float32)
    if lib is not None:
        n = lib.fls_read_bin(path.encode(), _fptr(out), capacity)
        if n >= 0:
            return out, n
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    n = min(len(raw), capacity)
    out[:n] = raw[:n]
    out[n:, :3] = 1e6
    out[n:, 3] = 0
    return out, n


def read_bins(paths: list[str], capacity: int, n_threads: int = 4):
    """Batch of .bin files -> (len(paths), capacity, 4) float32 + counts,
    decoded in parallel by the native thread pool."""
    lib = _load()
    count = len(paths)
    out = np.empty((count, capacity, 4), np.float32)
    counts = np.empty(count, np.int32)
    if lib is not None:
        joined = "\n".join(paths).encode()
        rc = lib.fls_read_bins(
            joined, count, _fptr(out), capacity,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads,
        )
        if rc == 0:
            return out, counts
    for i, p in enumerate(paths):
        out[i], counts[i] = read_bin(p, capacity)
    return out, counts


def read_bins_q16(paths: list[str], capacity: int, stride: int = 1,
                  blind: float = 0.0, max_range: float = 0.0,
                  scale: float = 1.0 / 256.0, n_threads: int = 4):
    """Production reader path: batch of .bin files decoded with the FAST-LIO
    preprocess filters (``stride`` = point_filter_num, ``blind``,
    ``max_range`` = det_range) applied host-side and xyz quantized to int16
    fixed point (``q = round(x / scale)``, decode on device with
    ``x = q * scale``). Returns ``((len(paths), capacity, 3) int16,
    counts)`` — half the upload bytes of float32 before the stride cut
    even starts. Pad lanes are zero; mask by count."""
    lib = _load()
    count = len(paths)
    out = np.empty((count, capacity, 3), np.int16)
    counts = np.empty(count, np.int32)
    if lib is not None:
        joined = "\n".join(paths).encode()
        rc = lib.fls_read_bins_q16(
            joined, count, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            capacity,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            int(stride), float(blind), float(max_range), float(1.0 / scale),
            n_threads,
        )
        if rc == 0:
            return out, counts
    # numpy fallback (identical semantics)
    for i, p in enumerate(paths):
        raw = np.fromfile(p, dtype=np.float32).reshape(-1, 4)[:, :3]
        if stride > 1:
            raw = raw[::stride]
        r2 = np.sum(raw * raw, axis=1)
        keep = r2 > blind * blind
        if max_range > 0.0:
            keep &= r2 < max_range * max_range
        raw = raw[keep][:capacity]
        q = np.clip(np.rint(raw / scale), -32767, 32767).astype(np.int16)
        n = len(q)
        out[i, :n] = q
        out[i, n:] = 0
        counts[i] = n
    return out, counts


def read_pcd_xyz(path: str, capacity: int):
    """Binary PCD -> padded (capacity, 3) float32 xyz + count (fast path)."""
    lib = _load()
    out = np.empty((capacity, 3), np.float32)
    if lib is not None:
        n = lib.fls_read_pcd_xyz(path.encode(), _fptr(out), capacity)
        if n >= 0:
            return out, n
    from .pcd import read_pcd, xyz_of

    cloud = read_pcd(path)
    xyz = xyz_of(cloud).astype(np.float32)
    n = min(len(xyz), capacity)
    out[:n] = xyz[:n]
    out[n:] = 1e6
    return out, n


class ScanPrefetcher:
    """Background-threaded scan staging (double/triple buffering ahead of
    the device feed). Iterates padded (capacity, 4) float32 scans."""

    def __init__(self, paths: list[str], capacity: int, depth: int = 4):
        self.paths = list(paths)
        self.capacity = capacity
        self._lib = _load()
        self._handle = None
        self._idx = 0
        if self._lib is not None:
            self._handle = self._lib.fls_prefetcher_create(
                "\n".join(self.paths).encode(), len(self.paths), capacity, depth
            )

    def __iter__(self):
        return self

    def __next__(self):
        if self._handle is not None:
            out = np.empty((self.capacity, 4), np.float32)
            n = self._lib.fls_prefetcher_next(self._handle, _fptr(out))
            if n == -2:
                raise StopIteration
            return out, n
        if self._idx >= len(self.paths):
            raise StopIteration
        out, n = read_bin(self.paths[self._idx], self.capacity)
        self._idx += 1
        return out, n

    def close(self):
        if self._handle is not None:
            self._lib.fls_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        self.close()
