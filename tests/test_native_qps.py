"""Native (C++) QPS parser: build, parity with the Python reader, speed."""

import io
import os
import time

import numpy as np
import pytest

from qpdo_tpu.io import read_qps
from qpdo_tpu.native import build_native, native_available, read_qps_native

from test_qps import HS21, HS21_WITH_CONST, TAME


def _parity(text):
    ref = read_qps(io.StringIO(text))
    nat = read_qps_native(text)
    assert nat.name == ref.name
    assert nat.n_structural == ref.n_structural
    np.testing.assert_allclose(nat.Q, ref.Q)
    np.testing.assert_allclose(nat.q, ref.q)
    assert nat.c == ref.c
    np.testing.assert_allclose(nat.A, ref.A)
    np.testing.assert_allclose(nat.l, ref.l)
    np.testing.assert_allclose(nat.u, ref.u)


def test_build():
    assert os.path.exists(build_native())
    assert native_available()


@pytest.mark.parametrize("text", [HS21, HS21_WITH_CONST, TAME])
def test_parity_fixtures(text):
    _parity(text)


def test_parity_generated_large():
    """Synthesize a larger random QPS file and require exact parity."""
    rng = np.random.default_rng(0)
    n, m = 40, 25
    lines = ["NAME GEN", "ROWS", " N obj"]
    senses = []
    for i in range(m):
        s = "LGE"[rng.integers(3)]
        senses.append(s)
        lines.append(f" {s} r{i}")
    lines.append("COLUMNS")
    for j in range(n):
        for i in range(m):
            if rng.random() < 0.2:
                lines.append(f" x{j} r{i} {rng.standard_normal():.6f}")
        if rng.random() < 0.7:
            lines.append(f" x{j} obj {rng.standard_normal():.6f}")
    lines.append("RHS")
    for i in range(m):
        if rng.random() < 0.8:
            lines.append(f" rhs r{i} {rng.standard_normal():.6f}")
    lines.append("RANGES")
    for i in range(m):
        if rng.random() < 0.3:
            lines.append(f" rng r{i} {rng.standard_normal():.6f}")
    lines.append("BOUNDS")
    for j in range(0, n, 3):
        kind = ["UP", "LO", "FX", "FR", "MI"][rng.integers(5)]
        if kind in ("FR", "MI"):
            lines.append(f" {kind} bnd x{j}")
        else:
            lines.append(f" {kind} bnd x{j} {rng.standard_normal():.6f}")
    lines.append("QUADOBJ")
    for j in range(n):
        lines.append(f" x{j} x{j} {abs(rng.standard_normal()) + 0.1:.6f}")
        if j + 1 < n and rng.random() < 0.3:
            lines.append(f" x{j} x{j+1} {0.01 * rng.standard_normal():.6f}")
    lines.append("ENDATA")
    _parity("\n".join(lines) + "\n")


def test_native_faster_on_big_file():
    # ~2 MB synthetic file; native should win clearly
    n, m = 150, 100
    rng = np.random.default_rng(1)
    lines = ["NAME BIG", "ROWS", " N obj"] + [f" L r{i}" for i in range(m)]
    lines.append("COLUMNS")
    for j in range(n):
        for i in range(m):
            lines.append(f" x{j} r{i} {rng.standard_normal():.8f}")
    lines.append("RHS")
    lines += [f" rhs r{i} 1.0" for i in range(m)]
    lines.append("QUADOBJ")
    lines += [f" x{j} x{j} 1.0" for j in range(n)]
    lines.append("ENDATA")
    text = "\n".join(lines) + "\n"

    t0 = time.perf_counter()
    ref = read_qps(io.StringIO(text))
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    nat = read_qps_native(text)
    t_nat = time.perf_counter() - t0
    np.testing.assert_allclose(nat.A, ref.A)
    assert t_nat < t_py  # typically 10-100x


def test_native_marker_and_trailing_bound_parity():
    from test_qps import read_qps as _read
    qps = """NAME MB
ROWS
 N obj
 L r1
COLUMNS
    MARKERA   'MARKER'  'INTORG'
 x1 r1 1.0 obj -1.0
    MARKERB   'MARKER'  'INTEND'
 x2 r1 2.0
RHS
 rhs r1 4.0
BOUNDS
 MI bnd x1 0.0
 UP bnd x2 3.0
QUADOBJ
 x1 x1 2.0
 x2 x2 2.0
ENDATA
"""
    _parity(qps)


def test_sparse_parse_and_solve():
    """dense=False returns scipy-sparse Q/A (the large-MM ingestion path)
    and solve_qps_data routes it through the sparse CG solver, matching
    the dense route."""
    import scipy.sparse as sps
    from qpdo_tpu.io import write_qps, solve_qps_data
    from qpdo_tpu.native import read_qps_native
    import qpdo_tpu as qt

    rng = np.random.default_rng(3)
    n, m = 30, 22
    M = rng.standard_normal((n, n))
    Q = M @ M.T / n + 0.1 * np.eye(n)
    p = qt.make_problem(Q, rng.standard_normal(n),
                        rng.standard_normal((m, n)),
                        -np.ones(m), np.ones(m))
    txt = write_qps(p, name="SPTEST")
    dd = read_qps_native(txt, dense=True)
    ds = read_qps_native(txt, dense=False)
    assert sps.issparse(ds.Q) and sps.issparse(ds.A)
    np.testing.assert_allclose(np.asarray(ds.Q.todense()), dd.Q)
    np.testing.assert_allclose(np.asarray(ds.A.todense()), dd.A)
    r_sparse = solve_qps_data(ds)
    r_dense = solve_qps_data(dd)
    assert int(r_sparse.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(np.asarray(r_sparse.x),
                               np.asarray(r_dense.x), atol=1e-7)
