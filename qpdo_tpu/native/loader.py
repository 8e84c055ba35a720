"""ctypes loader/builder for the native QPS parser."""

from __future__ import annotations

import ctypes
import gzip
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "qps_parser.cpp")
_LIB = os.path.join(_HERE, "libqpdo_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build_native(force: bool = False) -> str:
    """Compile the shared library (idempotent; rebuilds when the source is
    newer than the cached .so)."""
    with _lock:
        if (not force and os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return _LIB
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
               _SRC, "-o", _LIB]
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    build_native()
    lib = ctypes.CDLL(_LIB)
    H = ctypes.c_void_p
    lib.qps_parse.restype = H
    lib.qps_parse.argtypes = [ctypes.c_char_p, ctypes.c_long]
    lib.qps_error.restype = ctypes.c_char_p
    lib.qps_error.argtypes = [H]
    lib.qps_name.restype = ctypes.c_char_p
    lib.qps_name.argtypes = [H]
    for fn in ("qps_n", "qps_m_struct", "qps_m_total", "qps_q_nnz", "qps_a_nnz"):
        getattr(lib, fn).restype = ctypes.c_long
        getattr(lib, fn).argtypes = [H]
    lib.qps_obj_const.restype = ctypes.c_double
    lib.qps_obj_const.argtypes = [H]
    lp = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
    dp = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    lib.qps_copy_q.restype = None
    lib.qps_copy_q.argtypes = [H, lp, lp, dp]
    lib.qps_copy_a.restype = None
    lib.qps_copy_a.argtypes = [H, lp, lp, dp]
    lib.qps_copy_qlin.restype = None
    lib.qps_copy_qlin.argtypes = [H, dp]
    lib.qps_copy_bounds.restype = None
    lib.qps_copy_bounds.argtypes = [H, dp, dp]
    lib.qps_destroy.restype = None
    lib.qps_destroy.argtypes = [H]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def read_qps_native(path_or_text, dense: bool = True):
    """Parse a QPS file with the native parser.  Accepts a path (optionally
    .gz) or raw text.  Returns a ``qpdo_tpu.io.qps.QPSData``; with
    ``dense=False`` the Q/A members are scipy.sparse COO matrices —
    mandatory for large Maros-Mészáros instances (n up to ~90k never fits
    an (n, n) dense array) and feedable straight into ``solve_sparse``."""
    from ..io.qps import QPSData

    if os.path.exists(str(path_or_text)):
        p = str(path_or_text)
        raw = gzip.open(p, "rb").read() if p.endswith(".gz") else open(p, "rb").read()
    else:
        raw = path_or_text.encode() if isinstance(path_or_text, str) else path_or_text

    lib = _load()
    h = lib.qps_parse(raw, len(raw))
    if not h:
        raise MemoryError("qps_parse allocation failed")
    try:
        err = lib.qps_error(h)
        if err:
            raise ValueError(f"QPS parse error: {err.decode()}")
        n = lib.qps_n(h)
        m_struct = lib.qps_m_struct(h)
        m_total = lib.qps_m_total(h)
        name = lib.qps_name(h).decode()
        c = lib.qps_obj_const(h)

        q_nnz = lib.qps_q_nnz(h)
        qi = np.empty(q_nnz, np.int64)
        qj = np.empty(q_nnz, np.int64)
        qv = np.empty(q_nnz, np.float64)
        lib.qps_copy_q(h, qi, qj, qv)

        a_nnz = lib.qps_a_nnz(h)
        ai = np.empty(a_nnz, np.int64)
        aj = np.empty(a_nnz, np.int64)
        av = np.empty(a_nnz, np.float64)
        lib.qps_copy_a(h, ai, aj, av)

        qlin = np.empty(n, np.float64)
        lib.qps_copy_qlin(h, qlin)
        l = np.empty(m_total, np.float64)
        u = np.empty(m_total, np.float64)
        lib.qps_copy_bounds(h, l, u)
    finally:
        lib.qps_destroy(h)

    if dense:
        Q = np.zeros((n, n))
        np.add.at(Q, (qi, qj), qv)
        A = np.zeros((m_total, n))
        np.add.at(A, (ai, aj), av)
    else:
        import scipy.sparse as sps
        # duplicate triplets accumulate, same semantics as np.add.at
        Q = sps.coo_matrix((qv, (qi, qj)), shape=(n, n)).tocsr()
        A = sps.coo_matrix((av, (ai, aj)), shape=(m_total, n)).tocsr()
    return QPSData(name=name, Q=Q, q=qlin, c=c, A=A, l=l, u=u,
                   n_structural=int(m_struct))
