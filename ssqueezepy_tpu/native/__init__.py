# -*- coding: utf-8 -*-
"""Native (C++) host-side planning kernels.

Plan construction runs on host at trace time; its hot loops (the
reference JITs these with Numba, e.g. `find_downsampling_scale`'s
per-group scan, reference cwt_utils.py:459-580) are implemented in
`planlib.cpp` and loaded via ctypes. The shared object is built on first
use with the system toolchain and cached next to the source; every entry
point has a pure-Python fallback in `utils/cwt_utils.py`, and the tests
assert native == python.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ['available', 'find_downsampling_scale_native',
           'ridge_dp_forward_native']

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'planlib.cpp')
_SO = os.path.join(_HERE, 'planlib.so')

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-o', _SO,
           _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # -march=native may be unsupported; retry plain
            subprocess.run(['g++', '-O3', '-shared', '-fPIC', '-o', _SO,
                            _SRC], check=True, capture_output=True,
                           timeout=120)
            return True
        except Exception:
            return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO) <
                                       os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        lib.find_downsampling_scale.restype = ctypes.c_longlong
        lib.find_downsampling_scale.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_int]

        lib.ridge_dp_forward.restype = None
        lib.ridge_dp_forward.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def available():
    return _load() is not None


def find_downsampling_scale_native(Psih, span, tol, nonzero_th, nonzero_tol,
                                   method):
    """C++ twin of the group scan in utils.cwt_utils.
    `Psih` (na, Nh) float64 C-contiguous (right half already trimmed).
    Returns int index or None."""
    lib = _load()
    if lib is None:
        return NotImplemented
    Psih = np.ascontiguousarray(Psih, dtype=np.float64)
    na, Nh = Psih.shape
    m = {'any': 0, 'all': 1, 'sum': 2}[method]
    out = lib.find_downsampling_scale(
        Psih.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        na, Nh, int(span), float(tol), float(nonzero_th),
        float(nonzero_tol), m)
    return None if out < 0 else int(out)


def ridge_dp_forward_native(energy, penalty_matrix):
    """C++ twin of the ridge DP forward pass; returns (pen_e, argmins)."""
    lib = _load()
    if lib is None:
        return NotImplemented
    energy = np.ascontiguousarray(energy, dtype=np.float64)
    penalty_matrix = np.ascontiguousarray(penalty_matrix, dtype=np.float64)
    nf, nt = energy.shape
    pen_e = np.zeros((nf, nt), np.float64)
    argmins = np.zeros((nf, nt), np.int32)
    lib.ridge_dp_forward(
        energy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        penalty_matrix.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nf, nt,
        pen_e.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        argmins.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return pen_e, argmins
