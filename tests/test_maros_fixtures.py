"""Classic Maros-Mészáros / Hock-Schittkowski QPs with known optima,
encoded as QPS fixtures and solved end-to-end (the offline stand-in for the
full suite — no network in this environment)."""

import io

import numpy as np
import pytest

import qpdo_tpu as qt
from qpdo_tpu.io import read_qps, to_problem
from qpdo_tpu.native import read_qps_native

HS35 = """\
NAME          HS35
ROWS
 N  obj
 L  c1
COLUMNS
    x1        c1        1.0   obj       -8.0
    x2        c1        1.0   obj       -6.0
    x3        c1        2.0   obj       -4.0
RHS
    rhs       c1        3.0
    rhs       obj       -9.0
QUADOBJ
    x1        x1        4.0
    x1        x2        2.0
    x1        x3        2.0
    x2        x2        4.0
    x3        x3        2.0
ENDATA
"""
# optimum 1/9 at x = (4/3, 7/9, 4/9), x >= 0 default bounds

HS51 = """\
NAME          HS51
ROWS
 N  obj
 E  e1
 E  e2
 E  e3
COLUMNS
    x1        e1        1.0   obj       0.0
    x2        e1        3.0   e3        1.0
    x2        obj       -4.0
    x3        e2        1.0   obj       -4.0
    x4        e2        1.0   obj       -2.0
    x5        e2        -2.0  e3        -1.0
    x5        obj       -2.0
RHS
    rhs       e1        4.0
    rhs       obj       -6.0
BOUNDS
 FR bnd       x1
 FR bnd       x2
 FR bnd       x3
 FR bnd       x4
 FR bnd       x5
QUADOBJ
    x1        x1        2.0
    x1        x2        -2.0
    x2        x2        4.0
    x2        x3        2.0
    x3        x3        2.0
    x4        x4        2.0
    x5        x5        2.0
ENDATA
"""
# f = (x1-x2)^2 + (x2+x3-2)^2 + (x4-1)^2 + (x5-1)^2, three equality rows;
# optimum 0 at x = (1,1,1,1,1); Q is PSD singular.


@pytest.mark.parametrize("reader", [read_qps, read_qps_native])
def test_hs35(reader):
    d = reader(io.StringIO(HS35)) if reader is read_qps else reader(HS35)
    res = qt.solve(to_problem(d))
    assert int(res.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(float(res.info.objective), 1.0 / 9.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.x), [4/3, 7/9, 4/9], atol=1e-5)


@pytest.mark.parametrize("reader", [read_qps, read_qps_native])
def test_hs51(reader):
    d = reader(io.StringIO(HS51)) if reader is read_qps else reader(HS51)
    res = qt.solve(to_problem(d))
    assert int(res.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(float(res.info.objective), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.x), np.ones(5), atol=1e-4)


def test_hs35_hybrid_mode():
    d = read_qps(io.StringIO(HS35))
    res = qt.solve(to_problem(d), qt.Settings(hybrid_warmup=True,
                                              kkt_dtype="float32"))
    assert int(res.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(float(res.info.objective), 1.0 / 9.0,
                               atol=1e-6)
