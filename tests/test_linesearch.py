"""Property tests for the vectorized exact linesearch.

The returned tau must be a root of the piecewise-affine merit derivative

    phi(tau) = eta*tau + beta + delta' [delta*tau - alpha]_+

(the invariant the reference verifies in its commented-out debug block,
src/linesearch.c:53-66).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qpdo_tpu.ops.linesearch import pwa_root


def phi(tau, eta, beta, delta, alpha):
    return eta * tau + beta + delta @ np.maximum(delta * tau - alpha, 0.0)


@pytest.mark.parametrize("seed", range(20))
def test_root_property(seed):
    rng = np.random.default_rng(seed)
    m2 = 40
    eta = float(rng.random() + 0.1)
    delta = rng.standard_normal(m2)
    alpha = rng.standard_normal(m2)
    # choose beta so that psi'(0) < 0 (always true for a Newton descent
    # direction) — then a positive root exists and the scan is exact
    phi0 = phi(0.0, eta, 0.0, delta, alpha)
    beta = float(-phi0 - rng.random() * 3 - 0.1)
    tau = float(pwa_root(jnp.asarray(eta), jnp.asarray(beta),
                         jnp.asarray(delta), jnp.asarray(alpha)))
    assert np.isfinite(tau)
    assert abs(phi(tau, eta, beta, delta, alpha)) < 1e-9 * max(1.0, abs(tau))


def test_zero_delta_entries_ignored():
    rng = np.random.default_rng(42)
    m2 = 16
    delta = rng.standard_normal(m2)
    alpha = rng.standard_normal(m2)
    delta[::4] = 0.0
    eta, beta = 1.0, -2.0
    tau = float(pwa_root(jnp.asarray(eta), jnp.asarray(beta),
                         jnp.asarray(delta), jnp.asarray(alpha)))
    assert np.isfinite(tau)
    assert abs(phi(tau, eta, beta, delta, alpha)) < 1e-9


def test_no_breakpoints():
    # all breakpoints at tau <= 0: phi is affine with slope a0 on tau>0
    eta, beta = 2.0, -4.0
    delta = np.array([-1.0, -0.5])
    alpha = np.array([1.0, 2.0])  # taus negative
    tau = float(pwa_root(jnp.asarray(eta), jnp.asarray(beta),
                         jnp.asarray(delta), jnp.asarray(alpha)))
    assert abs(phi(tau, eta, beta, delta, alpha)) < 1e-12


def test_huge_breakpoint_no_cancellation():
    """Regression: an infinite-bound hinge puts delta*alpha ~ 1e20 in the
    prefix scan; a cumsum(x)-x exclusive scan cancels a0/b0 away and froze
    the solver on active-at-zero cold starts (tau = -0)."""
    eta = 0.024304976779529953
    beta = -0.04166319473377218
    delta = np.array([0.26350118, 0.13175059, -0.26350118, -0.13175059])
    alpha = np.array([3.16227766e+20, 0.0, 1.58113883e+01, 3.16227766e+20])
    tau = float(pwa_root(jnp.asarray(eta), jnp.asarray(beta),
                         jnp.asarray(delta), jnp.asarray(alpha)))
    assert abs(tau - 1.0) < 1e-6
    assert abs(phi(tau, eta, beta, delta, alpha)) < 1e-9


def test_active_at_zero_cold_start_solves():
    """End-to-end regression for the same bug: min x^2+x s.t. x<=5, x>=0
    cold-starts exactly on the active bound."""
    import qpdo_tpu as qt
    Q = np.array([[2.0]])
    q = np.array([1.0])
    A = np.array([[1.0], [1.0]])
    l = np.array([-np.inf, 0.0])
    u = np.array([5.0, np.inf])
    res = qt.solve(qt.make_problem(Q, q, A, l, u), qt.Settings(max_iter=50))
    assert int(res.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(np.asarray(res.x), [0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.y), [0.0, -1.0], atol=1e-5)


def test_root_beyond_all_breakpoints():
    eta, beta = 0.5, -100.0
    delta = np.array([0.1, 0.2])
    alpha = np.array([0.05, 0.1])
    tau = float(pwa_root(jnp.asarray(eta), jnp.asarray(beta),
                         jnp.asarray(delta), jnp.asarray(alpha)))
    assert abs(phi(tau, eta, beta, delta, alpha)) < 1e-9


@pytest.mark.parametrize("seed", range(15))
def test_bisect_matches_sort(seed):
    """The sort-free root finder agrees with the sorted scan."""
    from qpdo_tpu.ops.linesearch import pwa_root_bisect
    rng = np.random.default_rng(100 + seed)
    m2 = 60
    eta = float(rng.random() + 0.1)
    delta = rng.standard_normal(m2)
    alpha = rng.standard_normal(m2)
    phi0 = phi(0.0, eta, 0.0, delta, alpha)
    beta = float(-phi0 - rng.random() * 3 - 0.1)
    t_sort = float(pwa_root(jnp.asarray(eta), jnp.asarray(beta),
                            jnp.asarray(delta), jnp.asarray(alpha)))
    t_bis = float(pwa_root_bisect(jnp.asarray(eta), jnp.asarray(beta),
                                  jnp.asarray(delta), jnp.asarray(alpha)))
    assert abs(t_bis - t_sort) <= 1e-9 * max(1.0, abs(t_sort))
    assert abs(phi(t_bis, eta, beta, delta, alpha)) < 1e-8


def test_bisect_infinite_bound_breakpoints():
    from qpdo_tpu.ops.linesearch import pwa_root_bisect
    eta = 0.024304976779529953
    beta = -0.04166319473377218
    delta = np.array([0.26350118, 0.13175059, -0.26350118, -0.13175059])
    alpha = np.array([3.16227766e+20, 0.0, 1.58113883e+01, 3.16227766e+20])
    t = float(pwa_root_bisect(jnp.asarray(eta), jnp.asarray(beta),
                              jnp.asarray(delta), jnp.asarray(alpha)))
    assert abs(t - 1.0) < 1e-6


@pytest.mark.parametrize("seed", range(20))
def test_bisect_chunk_matches_sort(seed):
    """The chunked (launch-minimizing) root finder agrees with the scan."""
    from qpdo_tpu.ops.linesearch import pwa_root_bisect_chunk
    rng = np.random.default_rng(100 + seed)
    m2 = 60
    eta = float(rng.random() + 0.1)
    delta = rng.standard_normal(m2)
    alpha = rng.standard_normal(m2)
    phi0 = phi(0.0, eta, 0.0, delta, alpha)
    beta = float(-phi0 - rng.random() * 3 - 0.1)
    t_sort = float(pwa_root(jnp.asarray(eta), jnp.asarray(beta),
                            jnp.asarray(delta), jnp.asarray(alpha)))
    t_chunk = float(pwa_root_bisect_chunk(
        jnp.asarray(eta), jnp.asarray(beta),
        jnp.asarray(delta), jnp.asarray(alpha)))
    assert abs(t_chunk - t_sort) <= 1e-9 * max(1.0, abs(t_sort))
    assert abs(phi(t_chunk, eta, beta, delta, alpha)) < 1e-8


def test_bisect_chunk_infinite_bound_breakpoints():
    from qpdo_tpu.ops.linesearch import pwa_root_bisect_chunk
    eta = 0.024304976779529953
    beta = -0.04166319473377218
    delta = np.array([0.26350118, 0.13175059, -0.26350118, -0.13175059])
    alpha = np.array([3.16227766e+20, 0.0, 1.58113883e+01, 3.16227766e+20])
    t = float(pwa_root_bisect_chunk(jnp.asarray(eta), jnp.asarray(beta),
                                    jnp.asarray(delta), jnp.asarray(alpha)))
    assert abs(t - 1.0) < 1e-6


def test_bisect_chunk_solves_end_to_end():
    """linesearch='bisect_chunk' reaches 1e-6 with reference iterations."""
    import qpdo_tpu as qt
    from utils import kkt_residuals, random_qp

    Q, q, A, l, u = random_qp(40, 60, seed=23)
    p = qt.make_problem(Q, q, A, l, u)
    ref = qt.solve(p)
    res = qt.solve(p, qt.Settings(linesearch="bisect_chunk",
                                  linesearch_dtype="float32"))
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
    assert max(rp, rd) <= 1e-6
    assert abs(int(res.info.iterations) - int(ref.info.iterations)) <= 5


def test_reduced_precision_root_find():
    """linesearch_dtype="float32": solves still reach 1e-6 (tau only needs
    ~sqrt(eps) relative accuracy) with a near-identical iteration count."""
    import qpdo_tpu as qt
    from utils import random_qp

    Q, q, A, l, u = random_qp(40, 60, seed=17)
    p = qt.make_problem(Q, q, A, l, u)
    ref = qt.solve(p)
    res = qt.solve(p, qt.Settings(linesearch_dtype="float32"))
    assert int(res.info.status_val) == qt.SOLVED
    assert float(res.info.res_prim_norm) < 1e-6
    assert float(res.info.res_dual_norm) < 1e-6
    assert abs(int(res.info.iterations) - int(ref.info.iterations)) <= 5
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-6)
