"""Native host runtime: C++ kernels for host-side hot paths.

Builds runtime/native/recompose.cpp with g++ into a shared library on
first use (cached next to the source), loads it via ctypes, and exposes
numpy-facing wrappers. Every entry point has a pure-numpy fallback so
the framework works without a toolchain.

Native pieces (SURVEY.md §2.4/§5 — the reference's numba kernels and
host loops):
  * accumulate_running_mean / finalize_running_mean — room overlap-
    average recomposition (denoise_room.py:181-289),
  * fps_host / bucket_fps_host — host furthest point sampling for
    room-scale seeding (fpsample replacement).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("p2pb")

_SRC = os.path.join(os.path.dirname(__file__), "native", "recompose.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "native", "librecompose.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception as e:  # no toolchain / build error -> numpy fallback
        logger.warning("native runtime build failed (%s); using numpy fallback", e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if _build() is None:
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        i64 = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.accumulate_running_mean.argtypes = [f64p, i64p, f32p, i64p, i64p, i64, i64, i64]
        lib.accumulate_running_mean.restype = None
        lib.finalize_running_mean.argtypes = [f64p, i64p, f32p, f32p, i64]
        lib.finalize_running_mean.restype = i64
        lib.fps_host.argtypes = [f32p, i64, i64, i64p, f32p]
        lib.fps_host.restype = None
        lib.bucket_fps_host.argtypes = [f32p, i64, i64, i64, i64p, f32p, i64p]
        lib.bucket_fps_host.restype = None
        _lib = lib
        return _lib


# ------------------------------------------------------------- wrappers
def accumulate_running_mean(
    sums: np.ndarray,
    counts: np.ndarray,
    patches: np.ndarray,
    idxs: np.ndarray,
    cuts: np.ndarray,
) -> None:
    """In-place accumulation of patch predictions (sums f64, counts i64)."""
    patches = np.ascontiguousarray(patches, np.float32)
    idxs = np.ascontiguousarray(idxs, np.int64)
    cuts = np.ascontiguousarray(cuts, np.int64)
    lib = get_lib()
    if lib is not None:
        lib.accumulate_running_mean(
            sums, counts, patches, idxs, cuts,
            patches.shape[0], patches.shape[1], sums.shape[0],
        )
        return
    for patch, pid, cut in zip(patches, idxs, cuts):
        p, i = patch[: int(cut)], pid[: int(cut)]
        np.add.at(sums, i, p.astype(np.float64))
        np.add.at(counts, i, 1)


def finalize_running_mean(
    sums: np.ndarray, counts: np.ndarray, fallback: np.ndarray
) -> Tuple[np.ndarray, int]:
    """Returns (means-with-fallback float32 [N, 3], n_never_updated)."""
    fallback = np.ascontiguousarray(fallback, np.float32)
    out = np.empty_like(fallback)
    lib = get_lib()
    if lib is not None:
        misses = int(lib.finalize_running_mean(sums, counts, fallback, out, len(out)))
        return out, misses
    mask = counts > 0
    out[:] = fallback
    out[mask] = (sums[mask] / counts[mask, None]).astype(np.float32)
    return out, int((~mask).sum())


def fps_host(coords: np.ndarray, num_samples: int) -> np.ndarray:
    """Exact sequential FPS on the host. coords [N, 3] -> [M] int64."""
    coords = np.ascontiguousarray(coords, np.float32)
    n = coords.shape[0]
    m = min(num_samples, n)
    lib = get_lib()
    if lib is not None:
        out = np.empty(m, np.int64)
        dists = np.empty(n, np.float32)
        lib.fps_host(coords, n, m, out, dists)
        return out
    out = np.zeros(m, np.int64)
    dists = np.full(n, np.inf, np.float32)
    last = 0
    for j in range(1, m):
        d = np.sum((coords - coords[last]) ** 2, -1)
        np.minimum(dists, d, out=dists)
        last = int(np.argmax(dists))
        out[j] = last
    return out


def bucket_fps_host(coords: np.ndarray, num_samples: int,
                    pool_size: Optional[int] = None) -> np.ndarray:
    """Approximate FPS over a strided candidate pool for huge clouds."""
    coords = np.ascontiguousarray(coords, np.float32)
    n = coords.shape[0]
    m = min(num_samples, n)
    if pool_size is None:
        pool_size = min(n, max(4 * m, 4096))
    lib = get_lib()
    if lib is not None:
        out = np.empty(m, np.int64)
        dists = np.empty(max(n, pool_size), np.float32)
        pool = np.empty(pool_size, np.int64)
        lib.bucket_fps_host(coords, n, m, pool_size, out, dists, pool)
        return out
    if pool_size >= n:
        return fps_host(coords, m)
    pool = (np.arange(pool_size) * (n / pool_size)).astype(np.int64)
    sub_sel = fps_host(coords[pool], m)
    return pool[sub_sel]
