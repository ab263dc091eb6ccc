"""ctypes bindings for the C++ data-loading runtime (csrc/pointloader.cpp).

Falls back to the NumPy pipeline when the shared library hasn't been built
(``make -C csrc``). The native path does threaded .bin decode + rigid sweep
transforms + fixed-capacity batch fill off the Python GIL.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB = None


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "csrc", "libfsfloader.so")
    return cand if os.path.isfile(cand) else None


def available() -> bool:
    return _load() is not None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.fsf_file_num_floats.restype = ctypes.c_longlong
    lib.fsf_file_num_floats.argtypes = [ctypes.c_char_p]
    lib.fsf_read_floats.restype = ctypes.c_longlong
    lib.fsf_read_floats.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong
    ]
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.fsf_transform_sweep.restype = None
    lib.fsf_transform_sweep.argtypes = [
        f32p, ctypes.c_longlong, ctypes.c_int, f32p, f32p, ctypes.c_float, f32p
    ]
    lib.fsf_filter_range.restype = ctypes.c_longlong
    lib.fsf_filter_range.argtypes = [
        f32p, ctypes.c_longlong, ctypes.c_int, f32p, f32p
    ]
    lib.fsf_load_batch.restype = ctypes.c_longlong
    lib.fsf_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), f32p, f32p, f32p, i32p,
        ctypes.c_int, ctypes.c_int, f32p, i32p,
        ctypes.c_longlong, ctypes.c_int,
    ]
    _LIB = lib
    return lib


def read_points(path: str, dim: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.fromfile(path, dtype=np.float32).reshape(-1, dim)
    n = lib.fsf_file_num_floats(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    buf = np.empty(n, np.float32)
    got = lib.fsf_read_floats(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
    )
    return buf[:got].reshape(-1, dim)


def load_batch_native(
    paths: List[str],
    rots: Optional[np.ndarray],     # [J, 3, 3] or None
    transs: Optional[np.ndarray],   # [J, 3] or None
    dts: Optional[np.ndarray],      # [J] or None
    sample_idx: Sequence[int],
    in_dim: int,
    cap: int,
    n_threads: int = 8,
):
    """Threaded sweep loading into one fixed-capacity buffer.

    Returns (points [cap, in_dim+1], batch_idx [cap], n_valid).
    """
    lib = _load()
    assert lib is not None, "build csrc first: make -C csrc"
    j = len(paths)
    out_dim = in_dim + 1
    points = np.zeros((cap, out_dim), np.float32)
    batch = np.zeros(cap, np.int32)
    c_paths = (ctypes.c_char_p * j)(*[p.encode() for p in paths])
    f32p = ctypes.POINTER(ctypes.c_float)

    def fptr(a):
        return a.ctypes.data_as(f32p) if a is not None else None

    rots = np.ascontiguousarray(rots, np.float32) if rots is not None else None
    transs = np.ascontiguousarray(transs, np.float32) if transs is not None else None
    dts = np.ascontiguousarray(dts, np.float32) if dts is not None else None
    sidx = np.ascontiguousarray(sample_idx, np.int32)
    n = lib.fsf_load_batch(
        c_paths, fptr(rots), fptr(transs), fptr(dts),
        sidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        j, in_dim,
        points.ctypes.data_as(f32p),
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cap, n_threads,
    )
    return points, batch, int(n)
