"""ctypes bindings for the C++ kernel-map builder (csrc/kernel_map.cpp).

Compiled on first use with g++ (no pybind11 in this environment); falls back
silently to the NumPy builder when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import subprocess
import sys
from os.path import dirname, exists, join

import numpy as np

log = logging.getLogger(__name__)

_SRC = join(dirname(__file__), "csrc", "kernel_map.cpp")
_lib = None
_tried = False


def _lib_path() -> str:
    """Shared-object path keyed by source content hash.

    Content (not mtime) keying: on a fresh checkout every mtime equals
    checkout time, so an mtime test could accept a stale/foreign binary.
    A hash-named artifact can only ever be one this source produced.
    """
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:12]
    return join(dirname(_SRC), f"_kernel_map_{h}.so")


def _self_test(lib_path: str) -> bool:
    """Run a tiny build_self_plan in a subprocess so an ISA mismatch
    (SIGILL from a binary built with -march=native on another host) kills
    the child, not us. Cached via a .ok marker next to the artifact."""
    marker = lib_path + ".ok"
    if exists(marker):
        return True
    code = (
        "import ctypes, numpy as np\n"
        f"lib = ctypes.CDLL({lib_path!r})\n"
        "i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')\n"
        "lib.build_self_plan.argtypes = [i32p, ctypes.c_int64,"
        " ctypes.c_int64, i32p, ctypes.c_int64, i32p]\n"
        "coords = np.array([[0,0,0,0],[0,0,0,1]], dtype=np.int32)\n"
        "offs = np.array([[0,0,-1],[0,0,0],[0,0,1]], dtype=np.int32)\n"
        "fwd = np.full((3, 4), 3, dtype=np.int32)\n"
        "lib.build_self_plan(coords, 2, 4, offs, 3, fwd)\n"
        "assert fwd[1, 0] == 0 and fwd[1, 1] == 1, fwd\n"
        "assert fwd[2, 0] == 1 and fwd[0, 1] == 0, fwd\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True)
    if proc.returncode != 0:
        log.warning("native builder self-test failed (rc=%d): %s",
                    proc.returncode, proc.stderr.decode(errors="replace"))
        return False
    with open(marker, "w") as f:
        f.write("ok\n")
    return True


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        lib_file = _lib_path()
        if not exists(lib_file):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", lib_file, _SRC],
                check=True, capture_output=True)
        if not _self_test(lib_file):
            _lib = None
            return None
        lib = ctypes.CDLL(lib_file)
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
