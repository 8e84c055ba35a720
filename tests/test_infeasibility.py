"""Infeasibility detection acceptance tests.

Transcription of the reference's hard-asserted acceptance problems
(examples/infeasibility_tests.m): a degenerate-but-solvable QP (status 1), a
primal infeasible QP (status -3) and a dual infeasible / unbounded QP
(status -4), plus numerical validation of the returned Farkas-type
certificates (infeasibility_tests.m:50-55 and 77-90).
"""

import numpy as np

import qpdo_tpu as qt


def _setup(qp_a, qp_b, qp_c):
    Q = np.array([[1.0, 0.0], [0.0, 0.0]])
    q = np.array([1.0, qp_c])
    A = np.array([[qp_a, qp_a], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([-np.inf, 1.0, 1.0])
    u = np.array([0.0, 3.0, qp_b])
    return Q, q, A, l, u


SETTINGS = qt.Settings(max_iter=100)


def test_degenerate_solved():
    Q, q, A, l, u = _setup(0.0, 3.0, 0.0)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), SETTINGS)
    assert int(res.info.status_val) == qt.SOLVED


def test_primal_infeasible():
    Q, q, A, l, u = _setup(1.0, 3.0, 0.0)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), SETTINGS)
    assert int(res.info.status_val) == qt.PRIMAL_INFEASIBLE
    # certificate: ||A' dy|| small, u'[dy]_+ + l'[dy]_- < 0 relative to ||dy||
    dy = np.asarray(res.prim_inf_cert)
    assert np.all(np.isfinite(dy))
    norm_dy = np.max(np.abs(dy))
    assert norm_dy > 0
    assert np.max(np.abs(A.T @ dy)) / norm_dy <= 1e-4
    fin_u, fin_l = np.isfinite(u), np.isfinite(l)
    oob = u[fin_u] @ np.maximum(dy[fin_u], 0) + l[fin_l] @ np.minimum(dy[fin_l], 0)
    assert oob / norm_dy < 0
    # x, y are NaN-filled per the MEX contract (qpdo_mex.c:255-262)
    assert np.all(np.isnan(np.asarray(res.x)))
    assert np.all(np.isnan(np.asarray(res.y)))


def test_dual_infeasible():
    Q, q, A, l, u = _setup(0.0, np.inf, -1.0)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), SETTINGS)
    assert int(res.info.status_val) == qt.DUAL_INFEASIBLE
    # certificate dx is an unbounded descent direction ([0; 1] direction)
    dx = np.asarray(res.dual_inf_cert)
    assert np.all(np.isfinite(dx))
    norm_dx = np.max(np.abs(dx))
    assert norm_dx > 0
    assert np.max(np.abs(Q @ dx)) / norm_dx <= 1e-4
    assert (q @ dx) / norm_dx < 0
    Adx = A @ dx
    fin = np.isfinite(u) & np.isfinite(l)
    if fin.any():
        assert np.max(np.abs(Adx[fin])) / norm_dx <= 1e-4
    upper_only = np.isfinite(u) & ~np.isfinite(l)
    if upper_only.any():
        assert np.max(Adx[upper_only]) / norm_dx <= 1e-4
    lower_only = ~np.isfinite(u) & np.isfinite(l)
    if lower_only.any():
        assert np.min(Adx[lower_only]) / norm_dx >= -1e-4
    assert np.all(np.isnan(np.asarray(res.x)))
    assert np.all(np.isnan(np.asarray(res.y)))


def test_certificates_nan_when_solved():
    Q, q, A, l, u = _setup(0.0, 3.0, 0.0)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), SETTINGS)
    assert np.all(np.isnan(np.asarray(res.prim_inf_cert)))
    assert np.all(np.isnan(np.asarray(res.dual_inf_cert)))
    assert np.all(np.isfinite(np.asarray(res.x)))


def test_certificates_with_reduced_cert_dtype():
    """cert_dtype="float32": the three acceptance problems still classify
    correctly and the returned certificates stay valid (the eps-relative
    tests keep ~10x margin over float32 matvec noise)."""
    import qpdo_tpu as qt

    def prob(a, b, c):
        Q = np.array([[1.0, 0.0], [0.0, 0.0]])
        q = np.array([1.0, c])
        A = np.array([[a, a], [1.0, 0.0], [0.0, 1.0]])
        return qt.make_problem(Q, q, A, [-np.inf, 1, 1], [0.0, 3, b])

    s = qt.Settings(max_iter=100, cert_dtype="float32")
    r1 = qt.solve(prob(0.0, 3.0, 0.0), s)
    r2 = qt.solve(prob(1.0, 3.0, 0.0), s)
    r3 = qt.solve(prob(0.0, np.inf, -1.0), s)
    assert int(r1.info.status_val) == qt.SOLVED
    assert int(r2.info.status_val) == qt.PRIMAL_INFEASIBLE
    assert int(r3.info.status_val) == qt.DUAL_INFEASIBLE
    dy = np.asarray(r2.prim_inf_cert)
    assert np.max(np.abs(dy)) > 0 and np.all(np.isfinite(dy))
    dx = np.asarray(r3.dual_inf_cert)
    assert np.max(np.abs(dx)) > 0 and np.all(np.isfinite(dx))
