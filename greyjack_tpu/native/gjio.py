"""ctypes binding for the native IO library (`native/gjio.cpp`).

Builds the shared object on first use with g++ (cached next to the source);
falls back to the pure-Python parsers when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_build_failed = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "gjio.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libgjio.so")


def _build():
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def load_native():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception:
            _build_failed = True
            return None

        lib.gj_parse_instance.restype = ctypes.c_void_p
        lib.gj_parse_instance.argtypes = [ctypes.c_char_p]
        lib.gj_free.argtypes = [ctypes.c_void_p]
        for name in ("gj_error", "gj_name", "gj_edge_weight_type"):
            getattr(lib, name).restype = ctypes.c_char_p
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        for name in ("gj_capacity", "gj_vehicles_count", "gj_n_nodes",
                     "gj_demand_stride", "gj_n_demand_rows", "gj_n_depots",
                     "gj_matrix_rows"):
            getattr(lib, name).restype = ctypes.c_int64
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        for name, typ in (
            ("gj_node_ids", ctypes.c_int64), ("gj_node_xs", ctypes.c_double),
            ("gj_node_ys", ctypes.c_double), ("gj_demand_rows", ctypes.c_int64),
            ("gj_depot_ids", ctypes.c_int64), ("gj_matrix", ctypes.c_double),
        ):
            getattr(lib, name).restype = ctypes.POINTER(typ)
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_native() is not None


def _arr(ptr, n, dtype):
    if n == 0:
        return np.zeros(0, dtype=dtype)
    return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)


def parse_instance(path: str):
    """Parse a .tsp/.vrp file natively. Returns a dict with numpy arrays:
    name, edge_weight_type, capacity, vehicles_count, ids, xs, ys,
    demand_rows [n, stride], depot_ids, matrix [rows, n] or None.
    Returns None when the native library is unavailable.
    """
    lib = load_native()
    if lib is None:
        return None
    h = lib.gj_parse_instance(os.fsencode(path))
    try:
        err = lib.gj_error(h)
        if err:
            raise IOError(err.decode())
        n = lib.gj_n_nodes(h)
        stride = lib.gj_demand_stride(h)
        n_dem = lib.gj_n_demand_rows(h)
        mat_rows = lib.gj_matrix_rows(h)
        out = {
            "name": lib.gj_name(h).decode(),
            "edge_weight_type": lib.gj_edge_weight_type(h).decode(),
            "capacity": int(lib.gj_capacity(h)),
            "vehicles_count": int(lib.gj_vehicles_count(h)),
            "ids": _arr(lib.gj_node_ids(h), n, np.int64),
            "xs": _arr(lib.gj_node_xs(h), n, np.float64),
            "ys": _arr(lib.gj_node_ys(h), n, np.float64),
            "demand_rows": (
                _arr(lib.gj_demand_rows(h), n_dem * stride, np.int64)
                .reshape(n_dem, stride) if stride else
                np.zeros((0, 0), np.int64)
            ),
            "depot_ids": _arr(lib.gj_depot_ids(h), lib.gj_n_depots(h), np.int64),
            "matrix": (
                _arr(lib.gj_matrix(h), mat_rows * n, np.float64)
                .reshape(mat_rows, n) if mat_rows else None
            ),
        }
        return out
    finally:
        lib.gj_free(h)
