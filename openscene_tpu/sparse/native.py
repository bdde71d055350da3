"""ctypes bindings for the C++ kernel-map builder (csrc/kernel_map.cpp).

Compiled on first use with g++ (no pybind11 in this environment); falls back
silently to the NumPy builder when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from os.path import dirname, exists, getmtime, join

import numpy as np

log = logging.getLogger(__name__)

_SRC = join(dirname(__file__), "csrc", "kernel_map.cpp")
_LIB = join(dirname(__file__), "csrc", "_kernel_map.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not exists(_LIB) or getmtime(_LIB) < getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.build_self_plan.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                        i32p, ctypes.c_int64, i32p]
        lib.build_self_plan.restype = None
        lib.build_down_edge.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                        i32p, i32p, i32p, i32p]
        lib.build_down_edge.restype = ctypes.c_int64
        _lib = lib
    except Exception as e:  # no g++ / compile failure -> numpy fallback
        log.warning("native kernel-map builder unavailable (%s)", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_self_plan_native(coords: np.ndarray, n: int, cap: int,
                           offsets: np.ndarray, fwd: np.ndarray) -> None:
    """Fill fwd (K, cap) in place for valid rows; caller pre-fills nulls."""
    lib = _load()
    assert lib is not None
    coords = np.ascontiguousarray(coords[:n], dtype=np.int32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int32)
    assert fwd.flags.c_contiguous
    lib.build_self_plan(coords, n, cap, offsets, offsets.shape[0], fwd)


def build_down_edge_native(coords: np.ndarray, n: int, cap_parent: int,
                           fwd: np.ndarray):
    """Returns (parent_coords (n_parent,4), child_parent (n,),
    child_offset (n,)); fills fwd (8, cap_parent) in place (pre-nulled)."""
    lib = _load()
    assert lib is not None
    coords = np.ascontiguousarray(coords[:n], dtype=np.int32)
    parent_coords = np.empty((cap_parent, 4), dtype=np.int32)
    child_parent = np.empty(n, dtype=np.int32)
    child_offset = np.empty(n, dtype=np.int32)
    assert fwd.flags.c_contiguous
    n_parent = lib.build_down_edge(coords, n, cap_parent, parent_coords,
                                   child_parent, child_offset, fwd)
    if n_parent < 0:
        raise OverflowError(f"down edge overflow (cap_parent={cap_parent})")
    return parent_coords[:n_parent], child_parent, child_offset
