"""Applications layer: each canonical formulation is verified against an
independent oracle (scipy.optimize, Riccati recursion, duality gap, or the
problem's own KKT conditions) — never against the solver itself."""

import numpy as np
import pytest

import qpdo_tpu as qt
from qpdo_tpu import applications as apps

S = qt.Settings(verbose=False)


def _solve(problem, settings=S):
    res = qt.solve(problem, settings)
    assert int(res.info.status_val) == qt.SOLVED
    return res


def test_lasso_kkt_subgradient():
    rng = np.random.default_rng(0)
    F = rng.standard_normal((40, 15))
    xtrue = np.zeros(15)
    xtrue[:3] = [2.0, -1.5, 1.0]
    b = F @ xtrue + 0.05 * rng.standard_normal(40)
    lam = 2.0
    res = _solve(apps.lasso(F, b, lam))
    x = np.asarray(res.x)[:15]
    g = F.T @ (F @ x - b)
    tol = 1e-5
    active = np.abs(x) > 1e-6
    # subgradient optimality: g_i = -lam*sign(x_i) on the support,
    # |g_i| <= lam off it
    assert np.all(np.abs(g[active] + lam * np.sign(x[active])) <= tol)
    assert np.all(np.abs(g[~active]) <= lam + tol)
    # lasso shrinks: a lam this size must zero most of the noise support
    assert active.sum() <= 8


def test_nonneg_ls_matches_scipy():
    from scipy.optimize import nnls

    rng = np.random.default_rng(1)
    F = rng.standard_normal((30, 12))
    b = rng.standard_normal(30)
    res = _solve(apps.nonneg_ls(F, b))
    x_ref, _ = nnls(F, b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-6)


def test_svm_dual_strong_duality():
    rng = np.random.default_rng(2)
    N = 40
    X = np.concatenate([rng.standard_normal((N // 2, 2)) + 1.6,
                        rng.standard_normal((N // 2, 2)) - 1.6])
    y = np.concatenate([np.ones(N // 2), -np.ones(N // 2)])
    C = 1.0
    res = _solve(apps.svm_dual(X, y, C))
    a = np.asarray(res.x)
    assert np.all(a >= -1e-7) and np.all(a <= C + 1e-7)
    assert abs(y @ a) <= 1e-7
    w, bias = apps.svm_primal_from_dual(X, y, C, a)
    w, bias = np.asarray(w), float(bias)
    margins = y * (X @ w + bias)
    primal = 0.5 * w @ w + C * np.maximum(0.0, 1.0 - margins).sum()
    G = (X @ X.T) * np.outer(y, y)
    dual = a.sum() - 0.5 * a @ G @ a
    # strong duality: the gap certifies both the formulation and recovery
    assert abs(primal - dual) <= 1e-4 * max(1.0, abs(primal))
    # mostly-separated data: soft margin may concede a few overlap points
    assert np.mean(np.sign(X @ w + bias) == y) >= 0.95


def test_portfolio_matches_slsqp():
    from scipy.optimize import minimize

    rng = np.random.default_rng(3)
    N = 8
    M = rng.standard_normal((N, N))
    Sigma = M @ M.T / N + 0.05 * np.eye(N)
    mu = rng.standard_normal(N) * 0.1
    gamma = 2.0
    res = _solve(apps.portfolio(mu, Sigma, gamma))
    w = np.asarray(res.x)
    assert abs(w.sum() - 1.0) <= 1e-7
    assert np.all(w >= -1e-8)

    def obj(v):
        return gamma * v @ Sigma @ v - mu @ v

    ref = minimize(obj, np.full(N, 1.0 / N), method="SLSQP",
                   bounds=[(0, None)] * N,
                   constraints={"type": "eq", "fun": lambda v: v.sum() - 1.0},
                   options={"ftol": 1e-12, "maxiter": 500})
    assert obj(w) <= ref.fun + 1e-7


def test_mpc_condensed_unconstrained_matches_riccati():
    rng = np.random.default_rng(4)
    nx, nu, T = 3, 2, 8
    Ad = np.eye(nx) + 0.1 * rng.standard_normal((nx, nx))
    Bd = rng.standard_normal((nx, nu)) * 0.5
    Qx = np.eye(nx)
    Ru = 0.5 * np.eye(nu)
    x0 = rng.standard_normal(nx)

    res = _solve(apps.mpc_condensed(Ad, Bd, Qx, Ru, x0, T))
    U = np.asarray(res.x).reshape(T, nu)

    # finite-horizon Riccati oracle (terminal weight = Qx, matching QT=None)
    P = Qx.copy()
    Ks = []
    for _ in range(T):
        K = np.linalg.solve(Ru + Bd.T @ P @ Bd, Bd.T @ P @ Ad)
        P = Qx + Ad.T @ P @ (Ad - Bd @ K)
        Ks.append(K)
    Ks = Ks[::-1]
    x = x0.copy()
    for k in range(T):
        u_ref = -Ks[k] @ x
        np.testing.assert_allclose(U[k], u_ref, atol=1e-6)
        x = Ad @ x + Bd @ u_ref


def test_mpc_condensed_respects_bounds():
    rng = np.random.default_rng(5)
    nx, nu, T = 3, 1, 10
    Ad = np.array([[1.0, 0.1, 0.0], [0.0, 1.0, 0.1], [0.0, 0.0, 0.9]])
    Bd = np.array([[0.0], [0.05], [1.0]])
    x0 = np.array([1.5, 0.0, 0.0])
    res = _solve(apps.mpc_condensed(
        Ad, Bd, np.eye(nx), 0.1 * np.eye(nu), x0, T,
        u_lo=np.array([-0.4]), u_hi=np.array([0.4]),
        x_lo=np.full(nx, -2.0), x_hi=np.full(nx, 2.0)))
    U = np.asarray(res.x).reshape(T, nu)
    # feasibility up to eps_abs-level slack (primal residual tolerance)
    assert np.all(np.abs(U) <= 0.4 + 2e-6)
    x = x0.copy()
    for k in range(T):
        x = Ad @ x + Bd @ U[k]
        assert np.all(np.abs(x) <= 2.0 + 2e-6)
    # the bound must actually bind somewhere, or the test proves nothing
    assert np.any(np.abs(U) >= 0.4 - 1e-7)


def test_huber_matches_bfgs():
    from scipy.optimize import minimize

    rng = np.random.default_rng(6)
    N, p = 50, 6
    F = rng.standard_normal((N, p))
    xtrue = rng.standard_normal(p)
    b = F @ xtrue + 0.1 * rng.standard_normal(N)
    b[::7] += 5.0  # outliers: where Huber differs from least squares
    delta = 0.5

    res = _solve(apps.huber_fit(F, b, delta))
    x = np.asarray(res.x)[:p]

    def huber_obj(v):
        r = F @ v - b
        quad = np.abs(r) <= delta
        return (0.5 * np.sum(r[quad] ** 2)
                + np.sum(delta * (np.abs(r[~quad]) - 0.5 * delta)))

    ref = minimize(huber_obj, np.zeros(p), method="BFGS",
                   options={"gtol": 1e-10})
    np.testing.assert_allclose(huber_obj(x), ref.fun, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(x, ref.x, atol=1e-4)
    # robustness sanity: Huber beats plain LS on the true coefficients
    x_ls = np.linalg.lstsq(F, b, rcond=None)[0]
    assert np.linalg.norm(x - xtrue) < np.linalg.norm(x_ls - xtrue)


def test_lasso_vmaps():
    """Constructors are pure jnp: a batch of instances via vmap solves
    through the batched path."""
    import jax
    import jax.numpy as jnp
    from qpdo_tpu.parallel.batch import solve_batch

    rng = np.random.default_rng(7)
    Fb = jnp.asarray(rng.standard_normal((4, 20, 8)))
    bb = jnp.asarray(rng.standard_normal((4, 20)))
    probs = jax.vmap(lambda F, b: apps.lasso(F, b, 0.5))(Fb, bb)
    res = solve_batch(probs, S)
    assert np.all(np.asarray(res.info.status_val) == qt.SOLVED)
    for i in range(4):
        x = np.asarray(res.x[i])[:8]
        g = np.asarray(Fb[i]).T @ (np.asarray(Fb[i]) @ x - np.asarray(bb[i]))
        active = np.abs(x) > 1e-6
        assert np.all(np.abs(g[~active]) <= 0.5 + 1e-5)
        assert np.all(np.abs(g[active] + 0.5 * np.sign(x[active])) <= 1e-5)


def test_lasso_sparse_matches_dense():
    """The lifted sparse Lasso (diagonal Q, no Gram) reproduces the dense
    epigraph formulation's solution through the large-n path."""
    import scipy.sparse as sps

    rng = np.random.default_rng(8)
    F = sps.random(50, 20, density=0.3, random_state=8, format="csr")
    F.data[:] = rng.standard_normal(F.nnz)
    b = rng.standard_normal(50)
    lam = 1.0

    dense = _solve(apps.lasso(np.asarray(F.todense()), b, lam))
    Q, q, A, l, u, c = apps.lasso_sparse(F, b, lam)
    res = qt.solve_sparse(Q, q, A, l, u, c, settings=S)
    assert int(res.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(np.asarray(res.x)[:20],
                               np.asarray(dense.x)[:20], atol=1e-5)
    # lifted consistency: r = F x at the optimum
    x_full = np.asarray(res.x)
    np.testing.assert_allclose(x_full[40:], F @ x_full[:20], atol=1e-6)


def test_huber_sparse_matches_dense():
    rng = np.random.default_rng(9)
    import scipy.sparse as sps

    F = sps.random(40, 10, density=0.4, random_state=9, format="csr")
    F.data[:] = rng.standard_normal(F.nnz)
    b = rng.standard_normal(40)
    b[::6] += 3.0
    delta = 0.4

    dense = _solve(apps.huber_fit(np.asarray(F.todense()), b, delta))
    res = qt.solve_sparse(*apps.huber_sparse(F, b, delta), settings=S)
    assert int(res.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(np.asarray(res.x)[:10],
                               np.asarray(dense.x)[:10], atol=1e-5)


def test_lasso_sparse_large():
    """An ML-scale sparse Lasso (p=1500, N=3000) solves through the
    matrix-free CG path without densifying, verified by the subgradient
    oracle."""
    import scipy.sparse as sps

    rng = np.random.default_rng(10)
    N, p = 3000, 1500
    F = sps.random(N, p, density=0.002, random_state=10, format="csr")
    F.data[:] = rng.standard_normal(F.nnz)
    x_true = np.zeros(p)
    sup = rng.choice(p, 20, replace=False)
    x_true[sup] = rng.standard_normal(20) * 2.0
    b = F @ x_true + 0.01 * rng.standard_normal(N)
    lam = 0.05

    Q, q, A, l, u, c = apps.lasso_sparse(F, b, lam)
    res = qt.solve_sparse(Q, q, A, l, u, c, settings=qt.Settings(
        eps_abs=1e-6, max_iter=20000, inner_max_iter=100, eps_abs_in=0.1,
        rho=0.02, delta=0.1))
    assert int(res.info.status_val) == qt.SOLVED
    x = np.asarray(res.x)[:p]
    g = F.T @ (F @ x - b)
    active = np.abs(x) > 1e-6
    tol = 1e-4
    assert np.all(np.abs(g[~active]) <= lam + tol)
    assert np.all(np.abs(g[active] + lam * np.sign(x[active])) <= tol)


def test_mpc_condensed_scalar_bounds():
    """Scalar bounds broadcast to every stage (and a wrong-length vector
    raises at construction, not deep in the solver)."""
    Ad = np.array([[1.0, 0.1], [0.0, 0.95]])
    Bd = np.array([[0.0], [0.1]])
    res = _solve(apps.mpc_condensed(Ad, Bd, np.eye(2), 0.1 * np.eye(1),
                                    np.array([1.2, 0.0]), 6,
                                    u_lo=-0.3, u_hi=0.3))
    U = np.asarray(res.x)
    assert np.all(np.abs(U) <= 0.3 + 2e-6)
    with pytest.raises(ValueError, match="bound must be"):
        apps.mpc_condensed(Ad, Bd, np.eye(2), 0.1 * np.eye(1),
                           np.array([1.2, 0.0]), 6, u_lo=np.zeros(5))


def test_sparse_batch_accepts_generator():
    """solve_sparse_batch materializes iterators (mixed patterns arrive
    as a generator without crashing)."""
    import scipy.sparse as sps

    rng = np.random.default_rng(13)
    n, m = 15, 10

    def mk(b):
        Bm = sps.random(n, n, density=0.2 + 0.05 * b,
                        random_state=300 + b, format="csr")
        Q = (Bm.T @ Bm + 0.4 * sps.eye(n)).tocsr()
        A = sps.random(m, n, density=0.4, random_state=400 + b,
                       format="csr")
        A = A + sps.csr_matrix((rng.standard_normal(m),
                                (np.arange(m), rng.integers(0, n, m))),
                               shape=(m, n))
        return (Q, rng.standard_normal(n), A, -np.ones(m), np.ones(m))

    res = qt.solve_sparse_batch(mk(b) for b in range(3))
    assert res.x.shape == (3, n)
    assert np.all(np.asarray(res.info.status_val) == qt.SOLVED)


def test_sqp_minimize_classics():
    """SQP driver converges to the known optima of three classic NLPs
    (constrained Rosenbrock, HS6-style equality, entropy-simplex)."""
    import jax.numpy as jnp

    f = lambda z: (1 - z[0]) ** 2 + 100.0 * (z[1] - z[0] ** 2) ** 2
    c = lambda z: jnp.array([z[0] ** 2 + z[1] ** 2])
    x, its = apps.sqp_minimize(f, c, [0.0, 0.0], [-jnp.inf], [1.0])
    assert its < 50
    np.testing.assert_allclose(x, [0.7864, 0.6177], atol=1e-3)

    f2 = lambda z: (1 - z[0]) ** 2
    c2 = lambda z: jnp.array([10.0 * (z[1] - z[0] ** 2)])
    x, _ = apps.sqp_minimize(f2, c2, [-1.2, 1.0], [0.0], [0.0])
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-5)

    f3 = lambda z: (jnp.sum(z * jnp.log(jnp.maximum(z, 1e-12)))
                    + z @ jnp.arange(4.0))
    c3 = lambda z: jnp.concatenate([jnp.sum(z)[None], z])
    lo = jnp.concatenate([jnp.ones(1), jnp.zeros(4)])
    hi = jnp.concatenate([jnp.ones(1), jnp.full(4, jnp.inf)])
    x, _ = apps.sqp_minimize(f3, c3, jnp.full(4, 0.25), lo, hi)
    ref = np.exp(-np.arange(4.0))
    ref /= ref.sum()
    np.testing.assert_allclose(x, ref, atol=1e-4)
