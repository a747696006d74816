"""ctypes bindings for the native C++ SVML parser (native/svml_parser.cc).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, so the C ABI + ctypes is the binding layer).  Falls back are handled by
the caller (data/svml.py) — any exception here routes to the numpy parser.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.normpath(
    os.path.join(_HERE, "..", "..", "native", "svml_parser.cc")
)
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libsvmlparse.so")

_lib = None


class _SvmlResult(ctypes.Structure):
    _fields_ = [
        ("num_docs", ctypes.c_int64),
        ("num_features", ctypes.c_int64),
        ("features", ctypes.POINTER(ctypes.c_float)),
        ("labels", ctypes.POINTER(ctypes.c_float)),
        ("qids", ctypes.POINTER(ctypes.c_int64)),
        ("error", ctypes.c_char_p),
    ]


def _build() -> None:
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", "-o", _LIB_PATH, _SRC,
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
    lib.svml_read.restype = ctypes.POINTER(_SvmlResult)
    lib.svml_read.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.svml_release.restype = None
    lib.svml_release.argtypes = [ctypes.POINTER(_SvmlResult)]
    _lib = lib
    return lib


def read(path: str, nthreads: int = 0):
    """Parse an SVML file into a Dataset using the native parser."""
    from quickrank_tpu.data.dataset import Dataset

    lib = _load()
    res = lib.svml_read(path.encode(), nthreads)
    try:
        r = res.contents
        if r.error:
            raise ValueError(f"{path}: {r.error.decode()}")
        n, f = int(r.num_docs), int(r.num_features)
        feats = np.ctypeslib.as_array(r.features, shape=(n, f)).copy()
        labels = np.ctypeslib.as_array(r.labels, shape=(n,)).copy()
        qids = np.ctypeslib.as_array(r.qids, shape=(n,)).copy()
    finally:
        lib.svml_release(res)
    return Dataset.from_arrays(
        feats, labels, qids, name=os.path.basename(path)
    )


# -- writer (native/svml_writer.cc) ------------------------------------------

_WSRC = os.path.normpath(
    os.path.join(_HERE, "..", "..", "native", "svml_writer.cc")
)
_WLIB_PATH = os.path.join(os.path.dirname(_WSRC), "libsvmlwrite.so")

_wlib = None


def _load_writer():
    global _wlib
    if _wlib is not None:
        return _wlib
    if not os.path.exists(_WLIB_PATH) or (
        os.path.getmtime(_WLIB_PATH) < os.path.getmtime(_WSRC)
    ):
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", "-pthread", "-o", _WLIB_PATH, _WSRC,
            ],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_WLIB_PATH)
    lib.svml_write.restype = ctypes.c_int
    lib.svml_write.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
    ]
    _wlib = lib
    return lib


def write(ds, path: str, nthreads: int = 0) -> None:
    """Write a Dataset as SVML with the multithreaded native writer.
    Raises on any toolchain/IO failure — the caller falls back to the
    Python writer."""
    lib = _load_writer()
    feats = np.ascontiguousarray(ds.features, np.float32)
    labels = np.ascontiguousarray(ds.labels, np.float32)
    qids = np.ascontiguousarray(
        np.repeat(ds.qids, ds.docs_per_query()), np.int64
    )
    rc = lib.svml_write(
        path.encode(),
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        qids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(feats.shape[0]),
        ctypes.c_int64(feats.shape[1]),
        ctypes.c_int(nthreads),
    )
    if rc != 0:
        raise OSError(f"native svml writer failed (rc={rc}) for {path}")
