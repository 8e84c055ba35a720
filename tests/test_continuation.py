"""Continuation ladder (qpdo_tpu.continuation).

The LISWET family is the motivating case: multipliers of the
second-difference constraints scale ~n^2, so cold solves crawl ~n
iterations while a prolonged warm start hands the fine level a
near-converged active set (RESULTS.md "LISWET continuation").
"""
import numpy as np
import pytest
import scipy.sparse as sps

import qpdo_tpu as qt


def liswet(n, rng):
    Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
    t = np.linspace(0, 1, n)
    d = np.sin(4 * np.pi * t) + 0.1 * rng.standard_normal(n)
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
    return Q, -d, A, np.zeros(m), np.full(m, np.inf)


def restrict_liswet(fine, n_coarse):
    """The coarse problem of the same continuous instance: d restricted."""
    Qf, qf, Af, lf, uf = fine
    nf = qf.shape[0]
    d = np.interp(np.linspace(0, 1, n_coarse), np.linspace(0, 1, nf), -qf)
    n = n_coarse
    Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
    return Q, -d, A, np.zeros(m), np.full(m, np.inf)


SETTINGS = qt.Settings(eps_abs=1e-6, max_iter=20000, inner_max_iter=100,
                       eps_abs_in=0.1, rho=0.2, delta=1e-4, theta=0.9)


def kkt_ok(p, res, eps=1e-6):
    Q, q, A, l, u = p
    x, y = np.asarray(res.x), np.asarray(res.y)
    Ax = A @ x
    rp = np.max(np.abs(Ax - np.clip(Ax + y, l, u)))
    rd = np.max(np.abs(Q @ x + q + A.T @ y))
    return rp <= eps and rd <= eps


def test_grid1d_ladder_solves_and_saves_iterations():
    rng = np.random.default_rng(3)
    fine = liswet(480, rng)
    coarse = restrict_liswet(fine, 120)
    mid = restrict_liswet(fine, 240)

    def prolong(x, y, level):
        n_from = (120, 240)[level]
        n_to = (240, 480)[level]
        return qt.grid1d_prolong(n_from, n_to, order=2)(x, y)

    ladder = qt.solve_continuation([coarse, mid, fine], SETTINGS,
                                   prolong=prolong, dtype="float64",
                                   return_all=True)
    assert all(int(np.asarray(r.info.status_val)) == qt.SOLVED
               for r in ladder)
    assert kkt_ok(fine, ladder[-1])
    # the warm-started fine level beats the cold fine solve decisively
    cold = qt.solve_sparse(*fine, settings=SETTINGS, dtype="float64")
    assert int(ladder[-1].info.iterations) < 0.6 * int(cold.info.iterations)
    # ladder Result carries the whole-ladder wall time
    assert float(ladder[-1].info.run_time) > 0.0


def test_identity_continuation_dense_homotopy():
    """prolong=None: a data ramp over same-shape dense problems (the
    parametric/homotopy case) — each level warm-starts from the last."""
    rng = np.random.default_rng(5)
    n, m = 40, 30
    M = rng.standard_normal((n, n))
    Q = M @ M.T / n + 0.1 * np.eye(n)
    A = rng.standard_normal((m, n))
    l, u = -np.ones(m), np.ones(m)
    q1 = rng.standard_normal(n)
    q0 = np.zeros(n)
    probs = [qt.make_problem(Q, (1 - a) * q0 + a * q1, A, l, u)
             for a in (0.25, 0.5, 1.0)]
    res = qt.solve_continuation(probs, qt.Settings())
    assert int(np.asarray(res.info.status_val)) == qt.SOLVED
    assert kkt_ok((Q, q1, A, l, u), res)


def test_empty_ladder_raises():
    with pytest.raises(ValueError):
        qt.solve_continuation([], qt.Settings())
