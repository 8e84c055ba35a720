"""Differentiable layer (qpdo_tpu.diff): implicit gradients vs finite
differences.

The forward map is the solver itself; the backward pass is one adjoint KKT
solve (diff.py module docstring).  Finite differences of the *solved* QP are
the independent oracle — they exercise the whole implicit-function argument,
not just the linear algebra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qpdo_tpu as qt
from qpdo_tpu.diff import qp_solve

# tight tolerances: FD noise is ~eps_abs / h
SETTINGS = qt.Settings(eps_abs=1e-10, max_iter=500)
H = 1e-5


def make_qp(seed, n=12, m=18):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    Q = M @ M.T / n + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    l = -rng.random(m)
    u = rng.random(m)
    return Q, q, A, l, u


def loss_fn(theta, gx, gy):
    Q, q, A, l, u = theta
    x, y = qp_solve(Q, q, A, l, u, SETTINGS)
    return jnp.dot(gx, x) + jnp.dot(gy, y)


def fd_grad(loss, theta, which, coords):
    """Central finite differences of loss wrt theta[which] at the given
    flat coordinates."""
    out = {}
    base = [np.asarray(t, np.float64).copy() for t in theta]
    for c in coords:
        tp = [t.copy() for t in base]
        tm = [t.copy() for t in base]
        tp[which].flat[c] += H
        tm[which].flat[c] -= H
        out[c] = (float(loss(tp)) - float(loss(tm))) / (2 * H)
    return out


@pytest.fixture(scope="module")
def problem():
    Q, q, A, l, u = make_qp(0)
    # make sure the test problem has a meaningfully split active set
    res = qt.solve(qt.make_problem(Q, q, A, l, u), SETTINGS)
    assert int(res.info.status_val) == qt.SOLVED
    z = A @ np.asarray(res.x) + np.asarray(res.y)
    n_act = int(np.sum((z < l) | (z > u)))
    assert 0 < n_act < len(l)
    # strict complementarity margin so FD stays on one smooth piece
    assert np.min(np.abs(np.asarray(res.y)[(z < l) | (z > u)])) > 1e-3
    return Q, q, A, l, u


@pytest.fixture(scope="module")
def cotangents(problem):
    rng = np.random.default_rng(99)
    n = problem[0].shape[0]
    m = problem[2].shape[0]
    return jnp.asarray(rng.standard_normal(n)), \
        jnp.asarray(rng.standard_normal(m))


def _check(problem, gx, gy, which, coords, rtol=2e-3, atol=5e-4):
    grads = jax.grad(loss_fn)(tuple(map(jnp.asarray, problem)), gx, gy)
    fd = fd_grad(lambda th: loss_fn(tuple(map(jnp.asarray, th)), gx, gy),
                 problem, which, coords)
    for c, val in fd.items():
        got = float(np.asarray(grads[which]).flat[c])
        np.testing.assert_allclose(got, val, rtol=rtol, atol=atol,
                                   err_msg=f"param {which} coord {c}")


def test_grad_q(problem, cotangents):
    gx, gy = cotangents
    _check(problem, gx, gy, which=1, coords=range(len(problem[1])))


def test_grad_bounds(problem, cotangents):
    gx, gy = cotangents
    m = len(problem[3])
    _check(problem, gx, gy, which=3, coords=range(m))   # l
    _check(problem, gx, gy, which=4, coords=range(m))   # u


def test_grad_Q_entries(problem, cotangents):
    gx, gy = cotangents
    n = problem[0].shape[0]
    rng = np.random.default_rng(3)
    coords = rng.choice(n * n, size=8, replace=False)
    _check(problem, gx, gy, which=0, coords=coords)


def test_grad_A_entries(problem, cotangents):
    gx, gy = cotangents
    m, n = problem[2].shape
    rng = np.random.default_rng(4)
    coords = rng.choice(m * n, size=8, replace=False)
    _check(problem, gx, gy, which=2, coords=coords)


def test_inactive_bounds_zero_grad(problem, cotangents):
    """Inactive bounds have exactly zero sensitivity."""
    Q, q, A, l, u = problem
    gx, gy = cotangents
    grads = jax.grad(loss_fn)(tuple(map(jnp.asarray, problem)), gx, gy)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), SETTINGS)
    z = A @ np.asarray(res.x) + np.asarray(res.y)
    inactive = (z >= l) & (z <= u)
    assert np.all(np.asarray(grads[3])[inactive] == 0)
    assert np.all(np.asarray(grads[4])[inactive] == 0)


def test_jit_and_vmap(problem):
    """The layer composes with jit and vmap (a batch of perturbed QPs)."""
    Q, q, A, l, u = map(jnp.asarray, problem)
    B = 4
    rng = np.random.default_rng(7)
    qs = q[None, :] + 0.1 * jnp.asarray(rng.standard_normal((B, len(q))))

    def batch_loss(qs):
        def one(qi):
            x, _ = qp_solve(Q, qi, A, l, u, SETTINGS)
            return jnp.sum(x ** 2)
        return jnp.sum(jax.vmap(one)(qs))

    g = jax.jit(jax.grad(batch_loss))(qs)
    assert g.shape == qs.shape
    assert np.all(np.isfinite(np.asarray(g)))
    # spot-check one batch element against the unbatched gradient
    g0 = jax.grad(lambda qi: jnp.sum(qp_solve(Q, qi, A, l, u,
                                              SETTINGS)[0] ** 2))(qs[0])
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g0),
                               rtol=1e-6, atol=1e-9)


def test_equality_constrained_grad():
    """Equality rows (l == u) are always active; gradients still match FD
    when l and u move together."""
    rng = np.random.default_rng(11)
    n, m = 8, 4
    M = rng.standard_normal((n, n))
    Q = M @ M.T / n + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m) * 0.3
    theta = (Q, q, A, b, b)

    gx = jnp.asarray(rng.standard_normal(n))
    gy = jnp.zeros(m)

    def loss_b(bv):
        x, y = qp_solve(jnp.asarray(Q), jnp.asarray(q), jnp.asarray(A),
                        bv, bv, SETTINGS)
        return jnp.dot(gx, x)

    g = jax.grad(loss_b)(jnp.asarray(b))
    for c in range(m):
        bp, bm = b.copy(), b.copy()
        bp[c] += H
        bm[c] -= H
        fd = (float(loss_b(jnp.asarray(bp)))
              - float(loss_b(jnp.asarray(bm)))) / (2 * H)
        np.testing.assert_allclose(float(g[c]), fd, rtol=2e-3, atol=5e-4)


def test_sparse_layer_matches_dense_grads():
    """sparse_qp_layer gradients (pattern values + q/l/u) match the dense
    qp_solve gradients restricted to the pattern."""
    from qpdo_tpu.diff import sparse_qp_layer
    import scipy.sparse as sps

    rng = np.random.default_rng(5)
    n, m = 12, 18
    Q, q, A, l, u = make_qp(5, n, m)
    # sparsify A to a structural pattern; Q keeps its dense pattern
    A = np.where(rng.random((m, n)) < 0.4, A, 0.0)
    A[np.all(A == 0, axis=1), 0] = 1.0      # no empty rows
    Qs = sps.csr_matrix(Q)
    As = sps.csr_matrix(A)

    gx = jnp.asarray(rng.standard_normal(n))
    gy = jnp.asarray(rng.standard_normal(m))

    layer = sparse_qp_layer(Qs, As, SETTINGS, diff_mu=1e-9)
    Qc = Qs.tocsr().tocoo()
    Ac = As.tocsr().tocoo()

    def loss_sparse(q_data, a_data, qv, lv, uv):
        x, y = layer(q_data, a_data, qv, lv, uv)
        return jnp.dot(gx, x) + jnp.dot(gy, y)

    args = (jnp.asarray(Qc.data), jnp.asarray(Ac.data),
            jnp.asarray(q), jnp.asarray(l), jnp.asarray(u))
    grads_s = jax.grad(loss_sparse, argnums=(0, 1, 2, 3, 4))(*args)

    def loss_dense(theta):
        x, y = qp_solve(*theta, SETTINGS, diff_mu=1e-9)
        return jnp.dot(gx, x) + jnp.dot(gy, y)

    grads_d = jax.grad(loss_dense)(tuple(map(jnp.asarray,
                                             (Q, q, A, l, u))))
    # dense dQ/dA restricted to the patterns
    dQ_at = np.asarray(grads_d[0])[Qc.row, Qc.col]
    dA_at = np.asarray(grads_d[2])[Ac.row, Ac.col]
    np.testing.assert_allclose(np.asarray(grads_s[0]), dQ_at,
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(grads_s[1]), dA_at,
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(grads_s[2]),
                               np.asarray(grads_d[1]), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(grads_s[3]),
                               np.asarray(grads_d[3]), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(grads_s[4]),
                               np.asarray(grads_d[4]), rtol=1e-4, atol=1e-7)


def test_sparse_layer_large_n_grad_finite():
    """The sparse layer runs (forward + adjoint CG) at n=2000 without
    densifying; gradient of a scalar loss is finite and the forward
    solution verifies the KKT oracle."""
    from qpdo_tpu.diff import sparse_qp_layer
    import scipy.sparse as sps

    rng = np.random.default_rng(7)
    n, m = 2000, 1500
    B = sps.random(n, n, density=4.0 / n, random_state=7, format="csr")
    Qs = (B.T @ B + 0.5 * sps.eye(n)).tocsr()
    As = sps.random(m, n, density=6.0 / n, random_state=8, format="csr")
    q = rng.standard_normal(n)
    l, u = -rng.random(m), rng.random(m)

    st = qt.Settings(eps_abs=1e-8, newton_direct=False)
    layer = sparse_qp_layer(Qs, As, st, diff_mu=1e-7)
    Qc = Qs.tocoo()
    Ac = As.tocsr().tocoo()

    def loss(qv):
        x, _ = layer(jnp.asarray(Qc.data), jnp.asarray(Ac.data),
                     qv, jnp.asarray(l), jnp.asarray(u))
        return jnp.sum(x ** 2)

    x, y = layer(jnp.asarray(Qc.data), jnp.asarray(Ac.data),
                 jnp.asarray(q), jnp.asarray(l), jnp.asarray(u))
    xn, yn = np.asarray(x), np.asarray(y)
    rp = np.max(np.abs(As @ xn - np.clip(As @ xn + yn, l, u)))
    rd = np.max(np.abs(Qs @ xn + q + As.T @ yn))
    assert max(rp, rd) < 1e-7

    g = jax.grad(loss)(jnp.asarray(q))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.linalg.norm(g)) > 0


def test_forward_mode_matches_reverse():
    """mode='forward' (custom_jvp tangent saddle solve) agrees with the
    reverse-mode Jacobian: jacfwd(q -> x) == jacrev(q -> x)."""
    Q, q, A, l, u = make_qp(31)

    def fx(qv, mode):
        x, _ = qp_solve(Q, qv, A, l, u, SETTINGS, mode=mode)
        return x

    Jf = jax.jacfwd(lambda v: fx(v, "forward"))(jnp.asarray(q))
    Jr = jax.jacrev(lambda v: fx(v, "reverse"))(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(Jf), np.asarray(Jr),
                               rtol=1e-6, atol=1e-8)


def test_forward_mode_jvp_vs_fd():
    """One jvp along a random direction vs central finite differences of
    the solved QP (the full implicit-function oracle)."""
    Q, q, A, l, u = make_qp(32)
    rng = np.random.default_rng(33)
    dq = rng.standard_normal(q.shape)
    dl = rng.standard_normal(l.shape) * 0.01
    du = rng.standard_normal(u.shape) * 0.01

    def f(qv, lv, uv):
        return qp_solve(Q, qv, A, lv, uv, SETTINGS, mode="forward")

    (_, _), (dx, dy) = jax.jvp(
        f, (jnp.asarray(q), jnp.asarray(l), jnp.asarray(u)),
        (jnp.asarray(dq), jnp.asarray(dl), jnp.asarray(du)))

    xp, yp = qp_solve(Q, q + H * dq, A, l + H * dl, u + H * du, SETTINGS)
    xm, ym = qp_solve(Q, q - H * dq, A, l - H * dl, u - H * du, SETTINGS)
    fd_dx = (np.asarray(xp) - np.asarray(xm)) / (2 * H)
    fd_dy = (np.asarray(yp) - np.asarray(ym)) / (2 * H)
    np.testing.assert_allclose(np.asarray(dx), fd_dx, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dy), fd_dy, rtol=1e-3, atol=1e-4)


def test_qp_solve_mode_validation():
    Q, q, A, l, u = make_qp(34)
    with pytest.raises(ValueError):
        qp_solve(Q, q, A, l, u, SETTINGS, mode="banana")
