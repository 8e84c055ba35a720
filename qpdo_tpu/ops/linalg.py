"""Dense KKT formation and factorize/solve for the semismooth Newton step.

TPU-native replacement of the entire CHOLMOD machinery
(src/cholmod_interface.c:8-102).  The reference maintains a sparse LDL'
factor across iterations via rank-1 up/downdates as constraints enter/leave
the active set (cholmod_interface.c:57-93) — inherently sequential and
anti-TPU.  Here the reduced system

    K = Q + sigma*I*[proximal] + A' diag(active/mu) A          (always SPD)

is re-formed and re-factorized every Newton iteration as one masked matmul
plus a Cholesky — O(n^3/3) of MXU-friendly work that vmaps across a batch of
QPs.  The active set is a {0,1} weight vector, so shapes are static and there
is no gather/scatter.

The sigma shift is applied only when proximal, matching ldlchol
(cholmod_interface.c:11-16); K formation matches ldlcholQAtmuA
(cholmod_interface.c:35-52) with W = diag(active/mu).

Numerical-robustness additions for TPU float32 (no reference equivalent —
the reference is all-double):
- Jacobi (symmetric diagonal) pre-scaling of K before the Cholesky: with
  penalties mu as small as mu_min the condition of K is O(1/mu); scaling by
  1/sqrt(diag K) compresses the spread by orders of magnitude.
- Optional reduced-precision factorization: factor K in ``kkt_dtype``
  (e.g. float32) while forming residuals in the state dtype (e.g. float64),
  with iterative-refinement sweeps using exact residuals.  This keeps the
  O(n^3)/O(mn^2) work on the MXU fast path while recovering ~1e-6 accuracy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def form_kkt(Q, A, active, mu, sigma, proximal: bool):
    """K = Q + [proximal]*sigma*I + A' diag(active/mu) A."""
    w = active / mu                                   # (m,)
    K = Q + A.T @ (w[:, None] * A)
    if proximal:
        n = Q.shape[-1]
        K = K + sigma * jnp.eye(n, dtype=Q.dtype)
    return K


def _static_reg(dtype) -> float:
    """Static diagonal regularization of the Jacobi-scaled KKT factor.

    The scaled matrix has unit diagonal; floating-point rounding of the
    A'WA Gram product can perturb its spectrum by ~n*eps, turning a barely
    PSD matrix indefinite and the Cholesky into NaNs.  A shift two orders
    above eps keeps the factorization alive (same role as the static
    regularization in QDLDL-based solvers); iterative refinement against the
    *exact* K removes the bias."""
    return 100.0 * float(jnp.finfo(dtype).eps)


def jacobi_cholesky(K):
    """Factor the Jacobi-prescaled Khat = D^-1 K D^-1 + reg*I, with
    D = sqrt(diag K).  Returns (chol(Khat), dinv)."""
    d = jnp.sqrt(jnp.diagonal(K, axis1=-2, axis2=-1))
    d = jnp.where(d > 0, d, 1.0)
    dinv = (1.0 / d).astype(K.dtype)
    Khat = K * dinv[..., :, None] * dinv[..., None, :]
    n = K.shape[-1]
    Khat = Khat + _static_reg(K.dtype) * jnp.eye(n, dtype=K.dtype)
    return jnp.linalg.cholesky(Khat), dinv


def cholesky_solve(K, rhs, refine_steps: int = 0):
    """Solve K dx = rhs via Jacobi-prescaled Cholesky + iterative refinement.

    Replaces ldlchol + ldlsolveLD_rhs (cholmod_interface.c:8-30, 98-102).
    ``rhs`` may be a vector (..., n) or a matrix of columns (..., n, k)."""
    chol, dinv = jacobi_cholesky(K)
    matrix_rhs = rhs.ndim == K.ndim
    drow = dinv[..., :, None] if matrix_rhs else dinv

    def solve1(b):
        bh = b * drow
        z = jax.scipy.linalg.solve_triangular(chol, bh, lower=True)
        z = jax.scipy.linalg.solve_triangular(chol, z, lower=True, trans=1)
        return z * drow

    dx = solve1(rhs)
    for _ in range(refine_steps):
        dx = dx + solve1(rhs - K @ dx)
    return dx


def newton_system_solve(Q, A, active, mu, sigma, rhs, proximal: bool,
                        refine_steps: int = 0, kkt_dtype=None):
    """Form K and solve K dx = rhs (the factorization event of newton.c:21-49).

    With ``kkt_dtype`` set (e.g. float32 while the state is float64), the
    O(mn^2) formation and O(n^3) factorization run in reduced precision on
    the MXU, and each refinement sweep computes the residual with *exact*
    full-precision matvecs  K dx = Q dx + sigma dx + A'(w .* (A dx))  —
    O(n^2 + mn) — so the solution converges to state-dtype accuracy as long
    as cond(K)*eps(kkt_dtype) < 1.
    """
    dt = Q.dtype
    kdt = jnp.dtype(kkt_dtype) if kkt_dtype is not None else dt
    w = active / mu
    K = form_kkt(Q.astype(kdt), A.astype(kdt),
                 active.astype(kdt), mu.astype(kdt),
                 jnp.asarray(sigma, kdt), proximal)
    chol, dinv = jacobi_cholesky(K)

    def solve1(b):
        bh = (b * dinv).astype(kdt)
        z = jax.scipy.linalg.solve_triangular(chol, bh, lower=True)
        z = jax.scipy.linalg.solve_triangular(chol, z, lower=True, trans=1)
        return z.astype(dt) * dinv.astype(dt)

    Qk, Ak, wk = Q.astype(kdt), A.astype(kdt), w.astype(kdt)

    def resid(v):
        # residual matvecs in the KKT dtype: they only bound dx's accuracy
        # at ~eps(kdt) relative, which is enough — convergence is gated by
        # the state-dtype residuals, not by dx's last bits.  This keeps all
        # O(n^2 + mn) refinement work off the emulated-f64 path on TPU.
        vk = v.astype(kdt)
        Kv = (Qk @ vk + Ak.T @ (wk * (Ak @ vk))).astype(dt)
        if proximal:
            Kv = Kv + sigma * v
        return rhs - Kv

    dx = solve1(rhs)
    if refine_steps > 0:
        r = resid(dx)
        for _ in range(refine_steps):
            dx_new = dx + solve1(r)
            r_new = resid(dx_new)
            # monotone safeguard: refinement diverges once
            # cond(K)*eps(kkt_dtype) > 1; keep the better iterate
            better = jnp.linalg.norm(r_new) < jnp.linalg.norm(r)
            dx = jnp.where(better, dx_new, dx)
            r = jnp.where(better, r_new, r)
    # factorization-failure guard: a NaN factor must not poison the state
    # (the reference falls back to a simplicial factorization instead,
    # cholmod_interface.c:19-29)
    finite = jnp.all(jnp.isfinite(dx))
    return jnp.where(finite, dx, jnp.zeros_like(dx))
