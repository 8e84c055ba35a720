"""Degenerate-shape coverage: pure LPs (Q = 0), scalar problems, and
unbounded LPs.  The reference admits any PSD Q including 0
(include/types.h:81-90 places no rank requirement); the proximal
regularization makes the Newton matrix SPD regardless (README.md:12)."""

import numpy as np

import qpdo_tpu as qt


def test_pure_lp_solves():
    rng = np.random.default_rng(0)
    n, m = 10, 16
    A = rng.standard_normal((m, n))
    q = rng.standard_normal(n)
    prob = qt.make_problem(np.zeros((n, n)), q, A, -np.ones(m), np.ones(m))
    res = qt.solve(prob, qt.Settings(eps_abs=1e-8))
    assert int(res.info.status_val) == qt.SOLVED
    x, y = np.asarray(res.x), np.asarray(res.y)
    rp = np.max(np.abs(A @ x - np.clip(A @ x + y, -1, 1)))
    rd = np.max(np.abs(q + A.T @ y))
    assert max(rp, rd) <= 1e-7


def test_scalar_problem():
    prob = qt.make_problem(np.array([[2.0]]), np.array([1.0]),
                           np.array([[1.0]]), np.array([-0.2]),
                           np.array([0.3]))
    res = qt.solve(prob, qt.Settings(eps_abs=1e-9))
    assert int(res.info.status_val) == qt.SOLVED
    # min x^2 + x over [-0.2, 0.3]: unconstrained argmin -0.5 clips to -0.2
    np.testing.assert_allclose(float(res.x[0]), -0.2, atol=1e-7)


def test_unbounded_lp_dual_infeasible():
    """min -x with x >= 0 only: unbounded below -> DUAL_INFEASIBLE with a
    certificate ray (termination.c:156-216)."""
    prob = qt.make_problem(np.zeros((1, 1)), np.array([-1.0]),
                           np.array([[1.0]]), np.array([0.0]),
                           np.array([np.inf]))
    res = qt.solve(prob, qt.Settings())
    assert int(res.info.status_val) == qt.DUAL_INFEASIBLE
    ray = np.asarray(res.dual_inf_cert)
    assert np.isfinite(ray).all() and ray[0] > 0
