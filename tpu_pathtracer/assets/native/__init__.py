"""ctypes bindings for the native OBJ parser (objparser.cpp).

Compiled on first use with g++ (cached next to the source); every call
site falls back to the pure-Python parser if the toolchain or the build
is unavailable, so the native library is a pure accelerator, never a
hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "objparser.cpp")
_LIB = os.path.join(_HERE, "libobjparser.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


class _ObjResult(ctypes.Structure):
    _fields_ = [
        ("tri_v", ctypes.POINTER(ctypes.c_float)),
        ("tri_n", ctypes.POINTER(ctypes.c_float)),
        ("tri_uv", ctypes.POINTER(ctypes.c_float)),
        ("tri_mat", ctypes.POINTER(ctypes.c_int32)),
        ("num_tris", ctypes.c_int64),
        ("mat_names", ctypes.c_char_p),
        ("mtl_libs", ctypes.c_char_p),
        ("error", ctypes.c_char_p),
        ("state", ctypes.c_void_p),
    ]


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native parser; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.obj_parse.restype = ctypes.POINTER(_ObjResult)
        lib.obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_float, ctypes.c_int]
        lib.obj_free.argtypes = [ctypes.POINTER(_ObjResult)]
        lib.obj_free.restype = None
        _lib = lib
        return _lib


def parse_obj_native(
    path: str, scale: float = 1.0, skip_non_triangles: bool = False
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, list, list]]:
    """Parse with the native library.

    Returns (vertices [T,3,3], normals [T,3,3], uvs [T,3,2],
    face_mat_ids [T] — indices into usemtl first-use order, -1 none,
    usemtl_names, mtllib_names) or None when the library is unavailable.
    Raises FileNotFoundError for a missing file.
    """
    lib = get_lib()
    if lib is None:
        return None
    res = lib.obj_parse(
        os.fspath(path).encode(), ctypes.c_float(scale), int(skip_non_triangles)
    )
    try:
        r = res.contents
        if r.error:
            raise FileNotFoundError(r.error.decode())
        t = int(r.num_tris)
        if t == 0:
            empty = (
                np.zeros((0, 3, 3), np.float32),
                np.zeros((0, 3, 3), np.float32),
                np.zeros((0, 3, 2), np.float32),
                np.zeros((0,), np.int32),
            )
            names = (r.mat_names or b"").decode().split("\n")[:-1]
            libs = (r.mtl_libs or b"").decode().split("\n")[:-1]
            return (*empty, names, libs)
        tv = np.ctypeslib.as_array(r.tri_v, shape=(t, 3, 3)).copy()
        tn = np.ctypeslib.as_array(r.tri_n, shape=(t, 3, 3)).copy()
        tuv = np.ctypeslib.as_array(r.tri_uv, shape=(t, 3, 2)).copy()
        tm = np.ctypeslib.as_array(r.tri_mat, shape=(t,)).copy()
        names = (r.mat_names or b"").decode().split("\n")[:-1]
        libs = (r.mtl_libs or b"").decode().split("\n")[:-1]
        return tv, tn, tuv, tm, names, libs
    finally:
        lib.obj_free(res)
