"""Independent cross-validation against scipy.optimize (trust-constr).

The KKT-residual checks elsewhere verify stationarity/feasibility; this
file verifies the *optimal values and minimizers themselves* against a
completely independent solver, closing the loop the reference closes by
benchmarking against OSQP/QPALM (README.md:11-24)."""

import numpy as np
import pytest
from scipy.optimize import LinearConstraint, minimize

import qpdo_tpu as qt

from utils import random_qp


def _scipy_solve(Q, q, A, l, u, x0=None):
    n = Q.shape[0]
    res = minimize(
        lambda x: 0.5 * x @ Q @ x + q @ x,
        x0 if x0 is not None else np.zeros(n),
        jac=lambda x: Q @ x + q,
        hess=lambda x: Q,
        method="trust-constr",
        constraints=[LinearConstraint(A, l, u)],
        options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 2000})
    return res


@pytest.mark.parametrize("n,m,seed", [(8, 6, 0), (15, 10, 1), (25, 35, 2)])
def test_objective_matches_scipy(n, m, seed):
    Q, q, A, l, u = random_qp(n, m, seed=seed)
    ours = qt.solve(qt.make_problem(Q, q, A, l, u))
    assert int(ours.info.status_val) == qt.SOLVED
    ref = _scipy_solve(Q, q, A, l, u)
    obj_ours = float(ours.info.objective)
    obj_ref = 0.5 * ref.x @ Q @ ref.x + q @ ref.x
    # sharp one-sided check: ours is feasible to eps_abs and must be at
    # least as optimal as scipy's iterate (scipy often stops less tight)
    assert obj_ours <= obj_ref + 1e-6
    np.testing.assert_allclose(obj_ours, obj_ref, atol=1e-3)
    # strongly convex => unique minimizer
    np.testing.assert_allclose(np.asarray(ours.x), ref.x, atol=1e-3)


def test_equality_constrained_matches_scipy():
    Q, q, A, l, u = random_qp(12, 8, seed=5, eq_frac=1.0)
    ours = qt.solve(qt.make_problem(Q, q, A, l, u))
    assert int(ours.info.status_val) == qt.SOLVED
    ref = _scipy_solve(Q, q, A, l, u)
    np.testing.assert_allclose(float(ours.info.objective),
                               0.5 * ref.x @ Q @ ref.x + q @ ref.x,
                               atol=1e-5)
