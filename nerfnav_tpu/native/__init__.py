"""Native (C++) runtime components, self-building via g++ + ctypes.

The compute path of this framework is JAX/XLA/Pallas; the host runtime around
it keeps its hot non-tensor pieces native, mirroring how the reference keeps
its runtime in C++/CUDA. Currently: grid A* (astar.cpp). The shared library
is compiled on first use and cached next to the sources; every native entry
point has a pure-Python golden fallback, so the package works without a
toolchain.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libnerfnav.so")
_lib = None


def _build():
    srcs = [os.path.join(_DIR, "astar.cpp")]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH] + srcs
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src_mtime = max(
        os.path.getmtime(os.path.join(_DIR, f))
        for f in os.listdir(_DIR)
        if f.endswith(".cpp")
    )
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < src_mtime:
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.astar3d.restype = ctypes.c_int
    lib.astar3d.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    _lib = lib
    return lib


def astar_native(occupied, start, goal):
    """Same contract as nav.astar.astar_python: (H,W,D) bool occupancy,
    start/goal index triples -> list of triples or None; raises ValueError on
    occupied endpoints."""
    lib = _load()
    occ = np.ascontiguousarray(np.asarray(occupied, np.uint8))
    nx, ny, nz = occ.shape
    max_len = nx * ny * nz
    out = np.zeros(max_len, np.int32)
    res = lib.astar3d(
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nx, ny, nz,
        int(start[0]), int(start[1]), int(start[2]),
        int(goal[0]), int(goal[1]), int(goal[2]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_len,
    )
    if res == -2:
        raise ValueError("A* start or goal cell is occupied")
    if res < 0:
        return None
    path = out[:res]
    return [
        (int(i // (ny * nz)), int((i // nz) % ny), int(i % nz)) for i in path
    ]
