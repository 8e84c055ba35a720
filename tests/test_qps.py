"""QPS reader tests: synthetic fixtures + classic tiny Maros-Mészáros-style
problems with known optima solved end-to-end."""

import io

import numpy as np
import pytest

import qpdo_tpu as qt
from qpdo_tpu.io import read_qps, to_problem

HS21 = """\
NAME          HS21
ROWS
 N  obj
 G  r1
COLUMNS
    x1        r1        10.0
    x2        r1        -1.0
RHS
    rhs       r1        10.0
BOUNDS
 LO bnd       x1        2.0
 UP bnd       x1        50.0
 LO bnd       x2        -50.0
 UP bnd       x2        50.0
QUADOBJ
    x1        x1        0.02
    x2        x2        2.0
ENDATA
"""
# HS21: min 0.01 x1^2 + x2^2 - 100  s.t. 10x1 - x2 >= 10, 2<=x1<=50,
# -50<=x2<=50; optimum -99.96 at x=(2, 0).  (QUADOBJ stores Q with the
# 1/2 x'Qx convention: diag = [0.02, 2.0].)
HS21_WITH_CONST = HS21.replace(
    "RHS\n    rhs       r1        10.0\n",
    "RHS\n    rhs       obj       100.0\n    rhs       r1        10.0\n")

TAME = """\
NAME          TAME
ROWS
 N  obj
 E  e1
COLUMNS
    x1        e1        1.0
    x2        e1        1.0
RHS
    rhs       e1        1.0
QUADOBJ
    x1        x1        2.0
    x1        x2        -2.0
    x2        x2        2.0
ENDATA
"""
# TAME: min (x1-x2)^2 s.t. x1+x2=1, x>=0; optimum 0 at (0.5, 0.5)


def test_hs21_parse_and_solve():
    d = read_qps(io.StringIO(HS21))
    assert d.name == "HS21"
    np.testing.assert_array_equal(d.Q, np.diag([0.02, 2.0]))
    assert d.A.shape == (3, 2)  # 1 structural + 2 bound rows
    assert d.n_structural == 1
    res = qt.solve(to_problem(d))
    assert int(res.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(np.asarray(res.x), [2.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(float(res.info.objective), 0.04, atol=1e-6)


def test_objective_constant():
    d = read_qps(io.StringIO(HS21_WITH_CONST))
    assert d.c == -100.0
    res = qt.solve(to_problem(d))
    np.testing.assert_allclose(float(res.info.objective), -99.96, atol=1e-6)


def test_tame_equality_and_defaults():
    d = read_qps(io.StringIO(TAME))
    # default variable bounds are [0, inf) -> bound rows appended
    assert d.A.shape == (3, 2)
    assert d.l[0] == d.u[0] == 1.0
    res = qt.solve(to_problem(d))
    assert int(res.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-5)
    np.testing.assert_allclose(float(res.info.objective), 0.0, atol=1e-8)


def test_ranges_and_senses():
    qps = """\
NAME RNG
ROWS
 N obj
 L r1
 G r2
 E r3
COLUMNS
 x1 r1 1.0 r2 1.0
 x1 r3 1.0 obj 1.0
RHS
 rhs r1 4.0 r2 -2.0
 rhs r3 1.0
RANGES
 rng r1 2.0 r2 3.0
QUADOBJ
 x1 x1 2.0
ENDATA
"""
    d = read_qps(io.StringIO(qps))
    # L with range: [b-|r|, b]; G with range: [b, b+|r|]; E: [b, b]
    np.testing.assert_allclose(d.l[:3], [2.0, -2.0, 1.0])
    np.testing.assert_allclose(d.u[:3], [4.0, 1.0, 1.0])
    assert d.q[0] == 1.0


def test_free_and_fixed_bounds():
    qps = """\
NAME B
ROWS
 N obj
 G r1
COLUMNS
 x1 r1 1.0
 x2 r1 1.0
 x3 r1 1.0
RHS
 rhs r1 1.0
BOUNDS
 FR bnd x1
 FX bnd x2 0.5
 MI bnd x3
QUADOBJ
 x1 x1 1.0
 x2 x2 1.0
 x3 x3 1.0
ENDATA
"""
    d = read_qps(io.StringIO(qps))
    # x1 free: no bound row; x2 fixed; x3 (-inf, inf) upper default +inf ->
    # MI makes it lower-unbounded, upper stays +inf -> no row either
    assert d.A.shape[0] == 2  # r1 + x2's FX row
    fx_row = d.A[1]
    np.testing.assert_array_equal(fx_row, [0, 1, 0])
    assert d.l[1] == d.u[1] == 0.5


def test_marker_lines_ignored():
    qps = """NAME M
ROWS
 N obj
 G r1
COLUMNS
    MARKER1   'MARKER'  'INTORG'
    x1        r1        1.0   obj  1.0
    MARKER2   'MARKER'  'INTEND'
RHS
 rhs r1 1.0
QUADOBJ
 x1 x1 2.0
ENDATA
"""
    d = read_qps(io.StringIO(qps))
    assert d.Q.shape == (1, 1)
    assert d.q[0] == 1.0


def test_bound_type_with_trailing_value():
    """MPS files commonly write ' MI BND X1 0.0' — the value is ignored and
    must not create a phantom variable named '0.0'."""
    qps = """NAME B2
ROWS
 N obj
 G r1
COLUMNS
 x1 r1 1.0 obj 1.0
 x2 r1 1.0
RHS
 rhs r1 1.0
BOUNDS
 MI bnd x1 0.0
 FR bnd x2 1.5
QUADOBJ
 x1 x1 2.0
 x2 x2 2.0
ENDATA
"""
    d = read_qps(io.StringIO(qps))
    assert d.Q.shape == (2, 2)  # no phantom third variable
    # x1: lower -inf (MI), upper +inf default -> no bound row
    # x2: free -> no bound row
    assert d.A.shape[0] == 1


def test_write_read_roundtrip():
    """write_qps -> read_qps reproduces the problem (all row senses)."""
    from qpdo_tpu.io import write_qps
    import qpdo_tpu as qt
    rng = np.random.default_rng(3)
    n, m = 6, 8
    M = rng.standard_normal((n, n))
    Q = M @ M.T / n
    q = rng.standard_normal(n)
    A = np.round(rng.standard_normal((m, n)), 4)
    l = np.array([-1.0, 0.5, -np.inf, -2.0, -np.inf, 1.0, -3.0, 0.0])
    u = np.array([1.0, 0.5, 4.0, np.inf, np.inf, 1.0, 2.0, 0.1])
    p = qt.make_problem(np.round(Q, 4), np.round(q, 4), A, l, u, c=1.25)
    text = write_qps(p, name="RT")
    d = read_qps(io.StringIO(text))
    np.testing.assert_allclose(d.Q, np.asarray(p.Q))
    np.testing.assert_allclose(d.q, np.asarray(p.q))
    # the fully-unconstrained row 4 (-inf, inf) is dropped by the writer
    keep = [0, 1, 2, 3, 5, 6, 7]
    np.testing.assert_allclose(d.A, np.asarray(p.A)[keep])
    lc = np.clip(l[keep], -qt.QPDO_INFTY, qt.QPDO_INFTY)
    uc = np.clip(u[keep], -qt.QPDO_INFTY, qt.QPDO_INFTY)
    np.testing.assert_allclose(np.clip(d.l, -qt.QPDO_INFTY, qt.QPDO_INFTY), lc)
    np.testing.assert_allclose(np.clip(d.u, -qt.QPDO_INFTY, qt.QPDO_INFTY), uc)
    assert d.c == 1.25
    # and it solves identically
    r1 = qt.solve(p)
    r2 = qt.solve(qt.make_problem(d.Q, d.q, d.A, d.l, d.u, d.c))
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-9)


def test_duplicate_q_entries_accumulate(tmp_path):
    """Duplicate QUADOBJ entries accumulate (parity with the native parser,
    which np.add.at's all triplets) rather than overwriting."""
    txt = """NAME          DUPQ
ROWS
 N  obj
 G  r1
COLUMNS
    x1        obj       1.0   r1        1.0
    x2        r1        1.0
RHS
    rhs       r1        1.0
BOUNDS
 FR bnd       x1
 FR bnd       x2
QUADOBJ
    x1        x1        1.0
    x1        x1        1.0
    x1        x2        0.5
    x1        x2        0.5
ENDATA
"""
    f = tmp_path / "dupq.qps"
    f.write_text(txt)
    from qpdo_tpu.io.qps import read_qps
    data = read_qps(str(f))
    np.testing.assert_allclose(data.Q[0, 0], 2.0)
    np.testing.assert_allclose(data.Q[0, 1], 1.0)
    np.testing.assert_allclose(data.Q[1, 0], 1.0)


def test_cli_main(tmp_path, capsys):
    """python -m qpdo_tpu: parse, solve, one-line JSON out."""
    import json as _json

    import qpdo_tpu as qt
    from qpdo_tpu.__main__ import main
    from qpdo_tpu.io.qps import write_qps

    rng = np.random.default_rng(0)
    n, m = 20, 14
    M = rng.standard_normal((n, n))
    prob = qt.make_problem(M @ M.T / n + 0.3 * np.eye(n),
                           rng.standard_normal(n),
                           rng.standard_normal((m, n)),
                           -np.ones(m), np.ones(m))
    path = str(tmp_path / "cli.qps")
    write_qps(prob, path, name="CLI")
    rc = main([path, "--cpu", "--print-solution"])
    out = capsys.readouterr().out.strip().splitlines()
    head = _json.loads(out[0])
    sol = _json.loads(out[1])
    assert rc == 0
    assert head["status_val"] == 1
    assert head["n"] == n
    assert len(sol["x"]) == n and len(sol["y"]) == m


def test_cli_multi_file(tmp_path, capsys):
    """Several QPS files solve sequentially with a summary line (the MM
    directory workflow)."""
    import json as _json

    import qpdo_tpu as qt
    from qpdo_tpu.__main__ import main
    from qpdo_tpu.io.qps import write_qps

    rng = np.random.default_rng(1)
    paths = []
    for i, (n, m) in enumerate([(12, 9), (18, 13)]):
        M = rng.standard_normal((n, n))
        prob = qt.make_problem(M @ M.T / n + 0.3 * np.eye(n),
                               rng.standard_normal(n),
                               rng.standard_normal((m, n)),
                               -np.ones(m), np.ones(m))
        p = str(tmp_path / f"multi{i}.qps")
        write_qps(prob, p, name=f"M{i}")
        paths.append(p)
    rc = main(paths + ["--cpu"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert len(lines) == 3
    assert _json.loads(lines[0])["status_val"] == 1
    assert _json.loads(lines[1])["status_val"] == 1
    summary = _json.loads(lines[2])
    assert summary == {"files": 2, "solved": 2, "solve_rate": 1.0}
