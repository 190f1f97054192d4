"""Native host (CPU) broad phase.

The reference ships a first-class CPU broad phase beside the GPU one
(``src/scalable_ccd/broad_phase/`` — TBB sort-and-sweep; SURVEY.md §2 items
2-4).  This package is its native sibling here: a C++ sort-and-sweep
(``_native/sweep.cpp``, std::thread) compiled on demand with the system
toolchain and loaded through ctypes.  It serves callers that want candidate
pairs without a device round-trip, and doubles as a fast independent oracle
for the TPU sweep.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "native_available",
    "build_vertex_boxes",
    "build_element_boxes",
    "sort_and_sweep",
]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "_native", "sweep.cpp")
_LIB_PATH = os.path.join(_DIR, "_native", "libsccd_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[Exception] = None


def _compile() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB_PATH, _SRC, "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_error
    with _lock:
        if _lib is not None or _load_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _compile()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.sccd_build_vertex_boxes.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_double, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.sccd_build_element_boxes.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.sccd_sort_and_sweep.restype = ctypes.c_int64
            lib.sccd_sort_and_sweep.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.sccd_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception as e:  # toolchain missing etc.
            _load_error = e
        return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def build_vertex_boxes(
    vertices_t0: np.ndarray,
    vertices_t1: Optional[np.ndarray] = None,
    inflation_radius: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Conservative (min, max) vertex boxes, float64, ulp-widened."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native host library unavailable: {_load_error}")
    v0 = np.ascontiguousarray(vertices_t0, np.float64)
    v1 = None if vertices_t1 is None else np.ascontiguousarray(vertices_t1, np.float64)
    n = len(v0)
    vmin = np.empty((n, 3), np.float64)
    vmax = np.empty((n, 3), np.float64)
    lib.sccd_build_vertex_boxes(
        _ptr(v0), None if v1 is None else _ptr(v1), n,
        float(inflation_radius), _ptr(vmin), _ptr(vmax),
    )
    return vmin, vmax


def build_element_boxes(
    vmin: np.ndarray, vmax: np.ndarray, elements: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(min, max) boxes for edges (k=2) or faces (k=3) as vertex-box unions."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native host library unavailable: {_load_error}")
    el = np.ascontiguousarray(elements, np.int32)
    n, k = el.shape
    emin = np.empty((n, 3), np.float64)
    emax = np.empty((n, 3), np.float64)
    lib.sccd_build_element_boxes(
        _ptr(np.ascontiguousarray(vmin, np.float64)),
        _ptr(np.ascontiguousarray(vmax, np.float64)),
        _ptr(el), n, k, _ptr(emin), _ptr(emax),
    )
    return emin, emax


def sort_and_sweep(
    bmin: np.ndarray,
    bmax: np.ndarray,
    vertex_ids: np.ndarray,
    element_ids: np.ndarray,
    axis: int = 0,
    two_lists: bool = False,
    n_threads: int = 0,
) -> Tuple[np.ndarray, int]:
    """All filtered candidate pairs + recommended next sort axis.

    Same emit convention as the TPU sweep / the reference CPU path
    (``sort_and_sweep.cpp:106-118``): one-list (min,max) element ids;
    two-list (list-A id, list-B id) with list A pre-tagged by negative
    element ids (``flip_id``).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native host library unavailable: {_load_error}")
    if n_threads == 0:
        # test-CLI parity with the reference's --nthreads / tbb::global_control
        # (tests/main.cpp:67-68)
        n_threads = int(os.environ.get("SCCD_HOST_THREADS", "0"))
    bmin = np.ascontiguousarray(bmin, np.float64)
    bmax = np.ascontiguousarray(bmax, np.float64)
    vids = np.ascontiguousarray(vertex_ids, np.int32)
    eids = np.ascontiguousarray(element_ids, np.int32)
    n = len(bmin)
    out = ctypes.POINTER(ctypes.c_int32)()
    next_axis = ctypes.c_int(0)
    count = lib.sccd_sort_and_sweep(
        _ptr(bmin), _ptr(bmax), _ptr(vids), _ptr(eids), n,
        int(axis), int(bool(two_lists)), int(n_threads),
        ctypes.byref(out), ctypes.byref(next_axis),
    )
    if count < 0:
        raise MemoryError(
            "native sweep ran out of memory even at batch size 1 "
            "(the adaptive halving of sort_and_sweep.cpp:144-196)"
        )
    if count == 0:
        pairs = np.zeros((0, 2), np.int32)
    else:
        pairs = np.ctypeslib.as_array(out, shape=(int(count), 2)).copy()
    if out:
        lib.sccd_free(out)
    return pairs, int(next_axis.value)
