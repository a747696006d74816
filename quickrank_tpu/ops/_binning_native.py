"""ctypes bindings for the native C++ feature binner (native/binner.cc).

Same build/bind pattern as data/_svml_native.py (g++ on first use, plain C
ABI — no pybind11 in this image).  Callers (ops/binning.py) fall back to the
numpy path on any exception.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.normpath(os.path.join(_HERE, "..", "..", "native", "binner.cc"))
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libbinner.so")

_lib = None


def _build() -> None:
    subprocess.run(
        [
            # -ffp-contract=off: no FMA in fmin + step*i, so the equi-width
            # grid matches numpy's two-step float32 rounding bit-for-bit
            "g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
            "-fPIC", "-std=c++17", "-pthread", "-o", _LIB_PATH, _SRC,
        ],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.bin_build_thresholds.restype = ctypes.c_int
    lib.bin_build_thresholds.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        f32p, i32p,
    ]
    lib.bin_apply.restype = ctypes.c_int
    lib.bin_apply.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, f32p, ctypes.c_int64,
        ctypes.c_int, i32p,
    ]
    _lib = lib
    return lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def build_thresholds(
    features: np.ndarray, nthresholds: int, nthreads: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Native threshold-table build; requires nthresholds > 0."""
    assert nthresholds > 0
    lib = _load()
    feats = np.ascontiguousarray(features, np.float32)
    N, F = feats.shape
    Bcap = nthresholds + 1
    out = np.empty((F, Bcap), np.float32)
    counts = np.empty((F,), np.int32)
    rc = lib.bin_build_thresholds(
        _f32p(feats), N, F, int(nthresholds), int(nthreads), _f32p(out),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"bin_build_thresholds failed (rc={rc})")
    return out, counts


def apply_bins(
    features: np.ndarray, thresholds: np.ndarray, nthreads: int = 0
) -> np.ndarray:
    lib = _load()
    feats = np.ascontiguousarray(features, np.float32)
    th = np.ascontiguousarray(thresholds, np.float32)
    N, F = feats.shape
    Ft, B = th.shape
    assert Ft == F, (Ft, F)
    out = np.empty((N, F), np.int32)
    rc = lib.bin_apply(
        _f32p(feats), N, F, _f32p(th), B, int(nthreads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"bin_apply failed (rc={rc})")
    return out
