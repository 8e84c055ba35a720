"""Shared test helpers: random QP generation and independent KKT checks.

The KKT residual recomputation mirrors the reference's canonical correctness
oracle (examples/demo_mex.m:39-42):

    res_prim = || A x - proj_[l,u](A x + y) ||_inf
    res_dual = || Q x + q + A' y ||_inf
"""

import numpy as np


def random_qp(n, m, seed=0, density=1.0, rcond=1e-3, eq_frac=0.0):
    """Random convex QP with PSD (possibly ill-conditioned) Q and box
    constraints, in the style of examples/demo_mex.m:7-15."""
    rng = np.random.default_rng(seed)
    V = np.linalg.qr(rng.standard_normal((n, n)))[0]
    lam = np.logspace(np.log10(rcond), 0, n)
    Q = (V * lam) @ V.T
    Q = 0.5 * (Q + Q.T)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    if density < 1.0:
        A *= rng.random((m, n)) < density
    l = -rng.random(m)
    u = rng.random(m)
    n_eq = int(eq_frac * m)
    if n_eq:
        l[:n_eq] = u[:n_eq] = rng.standard_normal(n_eq) * 0.1
    return Q, q, A, l, u


def kkt_residuals(Q, q, A, l, u, x, y):
    """Independent NumPy recomputation of the unscaled KKT residuals."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    Ax = A @ x
    res_prim = Ax - np.clip(Ax + y, l, u)
    res_dual = Q @ x + q + A.T @ y
    return np.max(np.abs(res_prim)), np.max(np.abs(res_dual))
