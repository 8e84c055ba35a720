"""Stateful QPDO class: lifecycle + parametric updates (MPC workflow).

Covers the setup/warm_start/solve/update_q/update_bounds/update_settings
surface of the reference (include/qpdo.h:14-56, interfaces/mex/qpdo.m) and
the parametric re-solve loop of examples/demo_mex.m:45-56.
"""

import numpy as np
import pytest

import qpdo_tpu as qt

from utils import kkt_residuals, random_qp


def test_lifecycle_and_warm_start():
    Q, q, A, l, u = random_qp(30, 20, seed=1)
    solver = qt.QPDO()
    solver.setup(Q, q, A, l, u)
    res = solver.solve()
    assert int(res.info.status_val) == qt.SOLVED
    assert float(res.info.solve_time) > 0
    cold_iters = int(res.info.iterations)

    rng = np.random.default_rng(2)
    solver.warm_start(np.asarray(res.x) + 1e-3 * rng.standard_normal(30),
                      np.asarray(res.y) + 1e-3 * rng.standard_normal(20))
    res2 = solver.solve()
    assert int(res2.info.status_val) == qt.SOLVED
    assert int(res2.info.iterations) < cold_iters

    # reference resets `initialized` after each solve (qpdo.c:459):
    # the next solve is cold again
    res3 = solver.solve()
    assert int(res3.info.iterations) == cold_iters
    solver.delete()


def test_update_bounds():
    Q, q, A, l, u = random_qp(20, 15, seed=3)
    solver = qt.QPDO()
    solver.setup(Q, q, A, l, u)
    r1 = solver.solve()
    assert int(r1.info.status_val) == qt.SOLVED
    l2, u2 = l - 0.1, u + 0.2
    solver.update_bounds(l2, u2)
    r2 = solver.solve()
    assert int(r2.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l2, u2, r2.x, r2.y)
    assert rp <= 1e-6 and rd <= 1e-6
    with pytest.raises(ValueError):
        solver.update_bounds(u2, l2 - 10.0)


def test_update_q():
    Q, q, A, l, u = random_qp(20, 15, seed=4)
    solver = qt.QPDO()
    solver.setup(Q, q, A, l, u)
    r1 = solver.solve()
    assert int(r1.info.status_val) == qt.SOLVED
    q2 = q + 0.5
    solver.update_q(q2)
    r2 = solver.solve()
    assert int(r2.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q2, A, l, u, r2.x, r2.y)
    assert rp <= 1e-6 and rd <= 1e-6


def test_update_settings_scaling_rules():
    Q, q, A, l, u = random_qp(20, 15, seed=5)
    solver = qt.QPDO()
    solver.setup(Q, q, A, l, u, settings=qt.Settings(scaling=2))
    with pytest.raises(ValueError):
        solver.update_settings(qt.Settings(scaling=1))
    solver.update_settings(qt.Settings(scaling=6))
    res = solver.solve()
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
    assert rp <= 1e-6 and rd <= 1e-6


def test_mpc_loop():
    """Repeated warm-started re-solves with drifting q and bounds."""
    Q, q, A, l, u = random_qp(24, 16, seed=6)
    solver = qt.QPDO()
    solver.setup(Q, q, A, l, u)
    res = solver.solve()
    assert int(res.info.status_val) == qt.SOLVED
    rng = np.random.default_rng(7)
    for _ in range(3):
        q = q + 0.01 * rng.standard_normal(24)
        l = l - 0.01 * rng.random(16)
        u = u + 0.01 * rng.random(16)
        solver.update_q(q)
        solver.update_bounds(l, u)
        solver.warm_start(res.x, res.y)
        res = solver.solve()
        assert int(res.info.status_val) == qt.SOLVED
        rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
        assert rp <= 1e-6 and rd <= 1e-6


def test_constants():
    assert qt.QPDO.constant("QPDO_INFTY") == 1e20
    assert qt.QPDO.constant("QPDO_SOLVED") == 1
    with pytest.raises(ValueError):
        qt.QPDO.constant("nope")


def test_unconstrained_qp_empty_A():
    """Empty A (m=0): the MATLAB wrapper's empty-input default
    (interfaces/mex/qpdo.m); solution is -Q^-1 q."""
    rng = np.random.default_rng(70)
    n = 10
    M = rng.standard_normal((n, n))
    Q = M @ M.T / n + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    p = qt.make_problem(Q, q, np.zeros((0, n)), np.zeros(0), np.zeros(0))
    res = qt.solve(p)
    assert int(res.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(np.asarray(res.x),
                               -np.linalg.solve(Q, q), atol=1e-5)
