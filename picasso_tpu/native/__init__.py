"""picasso_tpu.native — C++ host-runtime kernels (ctypes binding).

Builds ``picasso_native.cpp`` with g++ on first import (cached next to
the source) and exposes typed wrappers. Falls back gracefully: callers
check ``AVAILABLE`` and keep a pure-Python path, so the package works
on machines without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "picasso_native.cpp")
_LIB = os.path.join(_DIR, "libpicasso_native.so")

AVAILABLE = False
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-march=native", "-fopenmp", _SRC, "-o", _LIB,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> None:
    global _lib, AVAILABLE
    if not os.path.isfile(_LIB) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        if not _build():
            return
    try:
        _lib = ctypes.CDLL(_LIB)
    except OSError:
        return
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    u8p = ctypes.c_void_p
    _lib.link_groups.restype = i64
    _lib.link_groups.argtypes = [
        i64p, f32p, f32p, i32p, i64p, i64, ctypes.c_double, i64, i32p,
    ]
    _lib.cut_spots.restype = None
    _lib.cut_spots.argtypes = [
        u8p, i64, i64, i64p, i64p, i64p, i64, i64, i64, u8p,
    ]
    _lib.cut_spots_to_photons_u16.restype = None
    _lib.cut_spots_to_photons_u16.argtypes = [
        np.ctypeslib.ndpointer(np.uint16, flags="C"),
        i64, i64, i64p, i64p, i64p, i64, i64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, f32p,
    ]
    _lib.nfndh.restype = None
    _lib.nfndh.argtypes = [
        i64p, f32p, f32p, i32p, i64p, i64p, i64,
        ctypes.c_double, ctypes.c_double, i64, i64p,
    ]
    _lib.cluster_label_sweep.restype = None
    _lib.cluster_label_sweep.argtypes = [
        i64p, i64p, i64p, i64p, i64, i32p,
    ]
    _lib.cluster_smlm.restype = i64
    _lib.cluster_smlm.argtypes = [
        f32p, f32p, ctypes.c_void_p, i64, ctypes.c_double, i64, i32p,
    ]
    AVAILABLE = True


_load()


def link_groups(
    frame: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    group: np.ndarray,
    d_max: float,
    max_dark_time: int,
) -> np.ndarray:
    """Greedy chain ids per loc (locs sorted by frame); native
    implementation of picasso/postprocess.py:2441 semantics."""
    n = len(frame)
    frame = np.ascontiguousarray(frame, np.int64)
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    group = np.ascontiguousarray(group, np.int32)
    min_idx = np.searchsorted(frame, frame + 1, side="left").astype(
        np.int64
    )
    out = np.empty(n, np.int32)
    _lib.link_groups(
        frame, x, y, group, min_idx, n, float(d_max),
        int(max_dark_time), out,
    )
    return out


def cut_spots(
    movie: np.ndarray,
    ids_frame: np.ndarray,
    ids_x: np.ndarray,
    ids_y: np.ndarray,
    box: int,
) -> np.ndarray:
    """Native ROI gather from a contiguous (frames, H, W) array."""
    movie = np.ascontiguousarray(movie)
    n = len(ids_frame)
    out = np.empty((n, box, box), movie.dtype)
    _lib.cut_spots(
        movie.ctypes.data_as(ctypes.c_void_p),
        movie.shape[1],
        movie.shape[2],
        np.ascontiguousarray(ids_frame, np.int64),
        np.ascontiguousarray(ids_x, np.int64),
        np.ascontiguousarray(ids_y, np.int64),
        n,
        box,
        movie.dtype.itemsize,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def cut_spots_to_photons(
    movie: np.ndarray,
    ids_frame: np.ndarray,
    ids_x: np.ndarray,
    ids_y: np.ndarray,
    box: int,
    baseline: float,
    sensitivity: float,
    gain: float,
) -> np.ndarray:
    """Fused uint16 ROI gather + photon conversion (single pass)."""
    movie = np.ascontiguousarray(movie, np.uint16)
    n = len(ids_frame)
    out = np.empty((n, box, box), np.float32)
    _lib.cut_spots_to_photons_u16(
        movie,
        movie.shape[1],
        movie.shape[2],
        np.ascontiguousarray(ids_frame, np.int64),
        np.ascontiguousarray(ids_x, np.int64),
        np.ascontiguousarray(ids_y, np.int64),
        n,
        box,
        float(baseline),
        float(sensitivity),
        float(gain),
        out,
    )
    return out


def cluster_label_sweep(
    lm_idx: np.ndarray,
    starts: np.ndarray,
    stops: np.ndarray,
    cols: np.ndarray,
    labels: np.ndarray,
) -> None:
    """Sequential SMLM-clusterer label sweep over local maxima
    (reference picasso/clusterer.py:176 semantics); writes into
    ``labels`` (int32, pre-filled with -1) in place."""
    _lib.cluster_label_sweep(
        np.ascontiguousarray(lm_idx, np.int64),
        np.ascontiguousarray(starts, np.int64),
        np.ascontiguousarray(stops, np.int64),
        np.ascontiguousarray(cols, np.int64),
        len(lm_idx),
        labels,
    )


def cluster_smlm(
    X: np.ndarray,
    radius: float,
    min_locs: int,
) -> np.ndarray:
    """Grid-hash SMLM clusterer core: fixed-radius neighbor counts,
    neighborhood-max local-maxima test and the sequential label sweep
    in one native pass (reference picasso/clusterer.py:114-201).
    ``X`` is (n, 2) or (n, 3); returns raw sweep labels (-1 =
    unassigned) — the caller applies the min_locs cluster-size
    discard."""
    X = np.ascontiguousarray(X, np.float32)
    n = len(X)
    labels = np.empty(n, np.int32)
    x = np.ascontiguousarray(X[:, 0])
    y = np.ascontiguousarray(X[:, 1])
    if X.shape[1] == 3:
        zc = np.ascontiguousarray(X[:, 2])
        zp = zc.ctypes.data_as(ctypes.c_void_p)
    else:
        zp = None
    _lib.cluster_smlm(
        x, y, zp, n, float(radius), int(min_locs), labels
    )
    return labels
