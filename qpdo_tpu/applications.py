"""Canonical QP formulations built on the solver: Lasso, SVM, portfolio,
condensed MPC, non-negative least squares, Huber fitting.

Each constructor returns a :class:`~qpdo_tpu.types.Problem` (plus, where the
QP variables are not the user's variables, an extractor that maps the QP
solution back).  The reference library has no such layer — its user-facing
problem class is the raw (Q, q, A, l, u) tuple (interfaces/mex/qpdo.m:50-160,
examples/demo_mex.m) — so these are additive convenience front-ends; every
constructor reduces to exactly that tuple and goes through the ordinary
:func:`qpdo_tpu.solve` path (scaling, certificates, warm starting all apply).

All constructors are pure jnp: they trace under ``jit``/``vmap``, so a batch
of Lasso instances is one ``vmap(lasso)`` away from the batched solver.
"""

from __future__ import annotations

import jax.numpy as jnp

from .api import make_problem
from .types import Problem

__all__ = [
    "lasso", "lasso_sparse", "svm_dual", "svm_primal_from_dual",
    "portfolio", "mpc_condensed", "nonneg_ls", "huber_fit", "huber_sparse",
    "sqp_minimize",
]

_INF = jnp.inf


def _eye_rows(k, dtype):
    return jnp.eye(k, dtype=dtype)


def lasso(F, b, lam) -> Problem:
    """L1-regularized least squares: min_x 0.5*||F x - b||^2 + lam*||x||_1.

    QP variables z = (x, t) with the standard epigraph split -t <= x <= t:

        min 0.5 z' blkdiag(F'F, 0) z + (-F'b, lam*1)' z + 0.5 b'b
        s.t.  x - t <= 0,  -x - t <= 0.

    The QP solution carries x in z[:p]; t converges to |x| row-wise.
    """
    F = jnp.asarray(F)
    b = jnp.asarray(b)
    p = F.shape[1]
    dt = F.dtype
    Q = jnp.zeros((2 * p, 2 * p), dt).at[:p, :p].set(F.T @ F)
    q = jnp.concatenate([-F.T @ b, jnp.full((p,), lam, dt)])
    eye = _eye_rows(p, dt)
    A = jnp.block([[eye, -eye], [-eye, -eye]])
    l = jnp.full((2 * p,), -_INF, dt)
    u = jnp.zeros((2 * p,), dt)
    return make_problem(Q, q, A, l, u, c=0.5 * b @ b)


def lasso_sparse(F, b, lam):
    """Large-scale Lasso for the sparse path: returns a scipy-sparse
    ``(Q, q, A, l, u, c)`` tuple for :func:`qpdo_tpu.solve_sparse` /
    ``solve_sparse_batch``.

    The residual is lifted so Q stays diagonal and every matrix inherits
    F's sparsity (no dense F'F Gram): variables z = (x, t, r) with

        min 0.5 r'r - b'r + lam*1't + 0.5 b'b
        s.t. F x - r = 0,   x - t <= 0,   -x - t <= 0

    x sits in z[:p]; at the optimum r = F x and t = |x|.
    """
    import numpy as np
    import scipy.sparse as sps

    F = sps.csr_matrix(F)
    b = np.asarray(b, float)
    N, p = F.shape
    Q = sps.diags(np.concatenate([np.zeros(2 * p), np.ones(N)])).tocsr()
    q = np.concatenate([np.zeros(p), np.full(p, float(lam)), -b])
    eye_p = sps.eye(p, format="csr")
    Z_pN = sps.csr_matrix((p, N))
    A = sps.vstack([
        sps.hstack([F, sps.csr_matrix((N, p)), -sps.eye(N, format="csr")]),
        sps.hstack([eye_p, -eye_p, Z_pN]),
        sps.hstack([-eye_p, -eye_p, Z_pN]),
    ]).tocsr()
    l = np.concatenate([np.zeros(N), np.full(2 * p, -np.inf)])
    u = np.concatenate([np.zeros(N), np.zeros(2 * p)])
    return Q, q, A, l, u, 0.5 * float(b @ b)


def huber_sparse(F, b, delta):
    """Large-scale Huber regression for the sparse path: the same split as
    :func:`huber_fit` with scipy-sparse matrices (diagonal Q, A inheriting
    F's sparsity).  Returns ``(Q, q, A, l, u)``; x sits in z[:p]."""
    import numpy as np
    import scipy.sparse as sps

    F = sps.csr_matrix(F)
    b = np.asarray(b, float)
    N, p = F.shape
    Q = sps.diags(np.concatenate([np.zeros(p), np.ones(N),
                                  np.zeros(2 * N)])).tocsr()
    q = np.concatenate([np.zeros(p + N), np.full(2 * N, float(delta))])
    eyeN = sps.eye(N, format="csr")
    A_eq = sps.hstack([F, -eyeN, -eyeN, eyeN])
    A_s = sps.hstack([sps.csr_matrix((2 * N, p + N)),
                      sps.eye(2 * N, format="csr")])
    A = sps.vstack([A_eq, A_s]).tocsr()
    l = np.concatenate([b, np.zeros(2 * N)])
    u = np.concatenate([b, np.full(2 * N, np.inf)])
    return Q, q, A, l, u


def svm_dual(X, labels, C) -> Problem:
    """Soft-margin linear SVM, dual form.

    min_a 0.5 a'(yy' * XX')a - 1'a   s.t. 0 <= a <= C,  y'a = 0.

    ``labels`` must be +-1.  Recover the primal with
    :func:`svm_primal_from_dual`.
    """
    X = jnp.asarray(X)
    y = jnp.asarray(labels, X.dtype)
    N = X.shape[0]
    dt = X.dtype
    G = (X @ X.T) * jnp.outer(y, y)
    q = -jnp.ones((N,), dt)
    A = jnp.concatenate([_eye_rows(N, dt), y[None, :]], axis=0)
    l = jnp.zeros((N + 1,), dt)
    u = jnp.concatenate([jnp.full((N,), C, dt), jnp.zeros((1,), dt)])
    return make_problem(G, q, A, l, u)


def svm_primal_from_dual(X, labels, C, alpha):
    """(w, bias) from the dual solution: w = X'(a*y); bias averaged over
    free support vectors (0 < a < C), the standard KKT recovery."""
    X = jnp.asarray(X)
    y = jnp.asarray(labels, X.dtype)
    alpha = jnp.asarray(alpha, X.dtype)
    w = X.T @ (alpha * y)
    tol = 1e-6 * C
    free = (alpha > tol) & (alpha < C - tol)
    # bias from complementary slackness y_i (w'x_i + b) = 1 on free SVs
    resid = y - X @ w
    denom = jnp.maximum(jnp.sum(free), 1)
    bias = jnp.sum(jnp.where(free, resid, 0.0)) / denom
    return w, bias


def portfolio(mu, Sigma, risk_aversion, w_min=0.0, w_max=None,
              budget=1.0) -> Problem:
    """Markowitz allocation: max mu'w - risk_aversion * w'Sigma w
    s.t. sum(w) = budget, w_min <= w <= w_max (long-only by default)."""
    mu = jnp.asarray(mu)
    Sigma = jnp.asarray(Sigma)
    N = mu.shape[0]
    dt = mu.dtype
    Q = 2.0 * risk_aversion * Sigma
    A = jnp.concatenate([jnp.ones((1, N), dt), _eye_rows(N, dt)], axis=0)
    hi = _INF if w_max is None else w_max
    l = jnp.concatenate([jnp.full((1,), budget, dt),
                         jnp.full((N,), w_min, dt)])
    u = jnp.concatenate([jnp.full((1,), budget, dt),
                         jnp.full((N,), hi, dt)])
    return make_problem(Q, -mu, A, l, u)


def mpc_condensed(Ad, Bd, Qx, Ru, x0, horizon, u_lo=None, u_hi=None,
                  x_lo=None, x_hi=None, QT=None) -> Problem:
    """Condensed linear-MPC QP over the input sequence U = (u_0..u_{T-1}).

    Dynamics x_{k+1} = Ad x_k + Bd u_k eliminate the states:
    X = S x0 + M U with S_k = Ad^{k+1} and M the lower block-Toeplitz of
    Ad^{k-1-j} Bd, giving

        min 0.5 U'(M' Qbar M + Rbar) U + (M' Qbar S x0)' U  (+ const)
        s.t. u_lo <= u_k <= u_hi  (identity rows)
             x_lo <= (S x0 + M U)_k <= x_hi  (state rows, shifted bounds)

    where Qbar = blkdiag(Qx,...,Qx,QT) over x_1..x_T and Rbar = I_T (x) Ru.
    This is the dense analogue of the warm-started MPC workflow the
    reference demonstrates (examples/demo_mex.m:45-56) — one QP per step,
    re-solved with update_q/update_bounds + warm_start as x0 moves.
    """
    Ad = jnp.asarray(Ad)
    Bd = jnp.asarray(Bd)
    Qx = jnp.asarray(Qx)
    Ru = jnp.asarray(Ru)
    x0 = jnp.asarray(x0)
    QT = Qx if QT is None else jnp.asarray(QT)
    nx, nu = Bd.shape
    T = int(horizon)
    dt = Bd.dtype

    # powers[k] = Ad^k for k = 0..T
    powers = [jnp.eye(nx, dtype=dt)]
    for _ in range(T):
        powers.append(Ad @ powers[-1])
    S = jnp.concatenate([powers[k + 1] for k in range(T)], axis=0)  # (T nx, nx)
    blocks = [[powers[k - j] @ Bd if j <= k else jnp.zeros((nx, nu), dt)
               for j in range(T)] for k in range(T)]
    M = jnp.block(blocks)  # (T nx, T nu)

    Qbar_blocks = [Qx] * (T - 1) + [QT]
    Qbar = jnp.zeros((T * nx, T * nx), dt)
    for k, Qk in enumerate(Qbar_blocks):
        Qbar = Qbar.at[k * nx:(k + 1) * nx, k * nx:(k + 1) * nx].set(Qk)
    Rbar = jnp.kron(jnp.eye(T, dtype=dt), Ru)

    H = M.T @ Qbar @ M + Rbar
    Sx0 = S @ x0
    g = M.T @ (Qbar @ Sx0)
    const = 0.5 * Sx0 @ (Qbar @ Sx0)

    def full(v, default, dim):
        if v is None:
            return jnp.full((T * dim,), default, dt)
        v = jnp.asarray(v, dt)
        if v.ndim == 0:
            return jnp.full((T * dim,), v, dt)
        if v.shape == (dim,):
            return jnp.tile(v, T)          # one bound per stage
        if v.size == T * dim:
            return v.reshape(-1)           # full per-stage bounds
        raise ValueError(
            f"bound must be a scalar, shape ({dim},), or {T}x{dim} "
            f"entries; got shape {v.shape}")

    rows = [jnp.eye(T * nu, dtype=dt)]
    lo = [full(u_lo, -_INF, nu)]
    hi = [full(u_hi, _INF, nu)]
    if x_lo is not None or x_hi is not None:
        lx_lo = full(x_lo, -_INF, nx) - Sx0
        lx_hi = full(x_hi, _INF, nx) - Sx0
        rows.append(M)
        lo.append(lx_lo)
        hi.append(lx_hi)
    A = jnp.concatenate(rows, axis=0)
    return make_problem(H, g, A, jnp.concatenate(lo), jnp.concatenate(hi),
                        c=const)


def nonneg_ls(F, b) -> Problem:
    """Non-negative least squares: min 0.5*||F x - b||^2  s.t. x >= 0."""
    F = jnp.asarray(F)
    b = jnp.asarray(b)
    p = F.shape[1]
    dt = F.dtype
    A = _eye_rows(p, dt)
    return make_problem(F.T @ F, -F.T @ b, A, jnp.zeros((p,), dt),
                        jnp.full((p,), _INF, dt), c=0.5 * b @ b)


def huber_fit(F, b, delta) -> Problem:
    """Huber regression: min_x sum_i phi_delta((F x - b)_i) with
    phi_delta(r) = 0.5 r^2 for |r| <= delta, delta(|r| - 0.5 delta) beyond.

    Standard QP split over z = (x, w, s+, s-):

        min 0.5 w'w + delta 1'(s+ + s-)
        s.t. F x - w - s+ + s- = b,   s+ >= 0,  s- >= 0

    so w carries the quadratic (small) part of each residual and s+/s- the
    linear tails.  x sits in z[:p].
    """
    F = jnp.asarray(F)
    b = jnp.asarray(b)
    N, p = F.shape
    dt = F.dtype
    nz = p + 3 * N
    Q = jnp.zeros((nz, nz), dt).at[p:p + N, p:p + N].set(jnp.eye(N, dtype=dt))
    q = jnp.concatenate([jnp.zeros((p + N,), dt), jnp.full((2 * N,), delta, dt)])
    eyeN = jnp.eye(N, dtype=dt)
    A_eq = jnp.concatenate([F, -eyeN, -eyeN, eyeN], axis=1)
    A_s = jnp.zeros((2 * N, nz), dt).at[:, p + N:].set(jnp.eye(2 * N, dtype=dt))
    A = jnp.concatenate([A_eq, A_s], axis=0)
    l = jnp.concatenate([b, jnp.zeros((2 * N,), dt)])
    u = jnp.concatenate([b, jnp.full((2 * N,), _INF, dt)])
    return make_problem(Q, q, A, l, u)


def sqp_minimize(f, c, x0, l, u, max_outer: int = 50, tol: float = 1e-8,
                 tr0: float = 1.0, settings=None):
    """Sequential Quadratic Programming for smooth nonlinear programs
    min f(x) s.t. l <= c(x) <= u, built on this QP solver.

    Classic recipe: linearize c at the iterate, solve a convex QP over
    the step (damped-BFGS Hessian estimate, trust-region box), globalize
    with an l1-merit backtracking linesearch; derivatives via
    jax.grad/jax.jacfwd, QP duals warm-start the next subproblem.
    Returns ``(x, iterations)``.

    Caveats (by design — this is a light driver, not a hardened NLP
    solver): f and c must be smooth jax-traceable callables, the BFGS
    model assumes a locally convex Lagrangian, and there is no
    feasibility restoration.  Validated on constrained Rosenbrock, an
    HS6-style equality problem, and an entropy/simplex problem
    (tests/test_applications.py).  The reference has no NLP layer.
    """
    import jax
    import numpy as np

    from .api import solve
    from .types import Settings

    grad_f = jax.grad(f)
    jac_c = jax.jacfwd(c)
    x = jnp.asarray(x0, jnp.float64)
    n = x.shape[0]
    B = jnp.eye(n)
    l = jnp.asarray(l, jnp.float64)
    u = jnp.asarray(u, jnp.float64)
    mu_merit = 10.0
    tr = tr0
    y_warm = None
    settings = settings or Settings(eps_abs=1e-9, verbose=False)

    def merit(x):
        cv = c(x)
        viol = jnp.maximum(l - cv, 0.0) + jnp.maximum(cv - u, 0.0)
        return f(x) + mu_merit * jnp.sum(viol)

    for it in range(max_outer):
        g = grad_f(x)
        J = jnp.atleast_2d(jac_c(x))
        cv = jnp.atleast_1d(c(x))
        m = cv.shape[0]
        A = jnp.concatenate([J, jnp.eye(n)], axis=0)
        lo = jnp.concatenate([l - cv, jnp.full((n,), -tr)])
        hi = jnp.concatenate([u - cv, jnp.full((n,), tr)])
        res = solve(make_problem(B, g, A, lo, hi), settings,
                    y0=y_warm if y_warm is not None else None)
        d = jnp.asarray(res.x)
        y_warm = jnp.asarray(res.y)
        if float(jnp.max(jnp.abs(d))) < tol:
            return np.asarray(x), it
        m0 = float(merit(x))
        t = 1.0
        while t > 1e-10 and float(merit(x + t * d)) > m0 - 1e-4 * t * float(
                d @ (B @ d)):
            t *= 0.5
        x_new = x + t * d
        # damped BFGS (Powell) on the Lagrangian gradient change
        yL = (grad_f(x_new) - g
              + (jnp.atleast_2d(jac_c(x_new)) - J).T @ y_warm[:m])
        s = x_new - x
        sBs = float(s @ (B @ s))
        sy = float(s @ yL)
        if sBs > 1e-14:
            theta = 1.0 if sy >= 0.2 * sBs else (0.8 * sBs) / (sBs - sy)
            r = theta * yL + (1 - theta) * (B @ s)
            B = (B - jnp.outer(B @ s, B @ s) / sBs
                 + jnp.outer(r, r) / float(s @ r))
        x = x_new
        tr = min(2.0 * tr, 10.0) if t == 1.0 else max(0.5 * tr, 1e-6)
    return np.asarray(x), max_outer
