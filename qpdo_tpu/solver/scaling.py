"""Ruiz equilibration + cost scaling.

TPU-native equivalent of src/scaling.c:24-91.  The reference mutates the
CHOLMOD CSC matrices in place through ``settings->scaling`` sequential passes;
here the same fixed number of passes runs as a ``lax.fori_loop`` over dense
arrays — each pass is two row/col inf-norm reductions plus two broadcasts,
which XLA fuses into a handful of VPU sweeps.

Semantics preserved exactly:
- Ruiz runs on A only (scaling.c:36-63): D_k = 1/sqrt(colnorm_inf A),
  E_k = 1/sqrt(rownorm_inf A), A <- E A D, with accumulation into D, E.
- Norms below MIN_SCALING are reset to 1 (limit_scaling, scaling.c:13-18).
- Then Q <- c D Q D, q <- c D q with c = 1/max(1, ||Dq + Qx||_inf) where the
  Qx cache is zero at setup (scaling.c:65-79), and l/u <- E*l/u
  (scaling.c:87-88).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as _c
from ..types import Problem, Scaling, ScaledProblem


def limit_scaling(v: jax.Array) -> jax.Array:
    """Reset norms below MIN_SCALING to 1 (reference: scaling.c:13-18)."""
    return jnp.where(v < _c.MIN_SCALING, jnp.ones_like(v), v)


def ruiz_equilibrate(A: jax.Array, iters: int):
    """Run ``iters`` Ruiz passes on A. Returns (A_scaled, D, E) with
    A_scaled = diag(E) @ A @ diag(D)."""
    m, n = A.shape
    dt = A.dtype

    def body(_, carry):
        A_k, D, E = carry
        d = jax.lax.rsqrt(limit_scaling(jnp.max(jnp.abs(A_k), axis=0)))  # (n,)
        e = jax.lax.rsqrt(limit_scaling(jnp.max(jnp.abs(A_k), axis=1)))  # (m,)
        A_k = A_k * e[:, None] * d[None, :]
        return A_k, D * d, E * e

    init = (A, jnp.ones((n,), dt), jnp.ones((m,), dt))
    if iters == 0:
        return init
    return jax.lax.fori_loop(0, iters, body, init)


def ruiz_equilibrate_kkt(Q: jax.Array, A: jax.Array, iters: int):
    """Ruiz passes on the full KKT structure [[Q, A'], [A, 0]] (the
    OSQP-style modified Ruiz).  Returns (Q_scaled, A_scaled, D, E) with
    Q_scaled = diag(D) Q diag(D), A_scaled = diag(E) A diag(D).

    The reference equilibrates A only (scaling.c:36-63), which leaves a
    wide-scale Q (e.g. diag entries spanning 1e-4..1e4) untouched — the
    KKT matrix K = Q + sigma*I + A'WA then carries Q's conditioning into
    every Newton solve and the penalty schedule.  Including Q in the Ruiz
    iteration bounds every row/column of the scaled KKT structure near 1.
    Opt-in via ``Settings.ruiz_kkt`` (default False = reference parity).

    Per pass: column j's norm over the primal block is
    max(||Q_j||_inf, ||A_j||_inf) (Q symmetric, so row norm = column
    norm); the dual column norm is A's row norm (the zero block adds
    nothing) — exactly the column norms of the stacked KKT matrix.
    """
    m, n = A.shape
    dt = A.dtype

    def body(_, carry):
        Q_k, A_k, D, E = carry
        colQ = jnp.max(jnp.abs(Q_k), axis=0)                      # (n,)
        colA = jnp.max(jnp.abs(A_k), axis=0)                      # (n,)
        d = jax.lax.rsqrt(limit_scaling(jnp.maximum(colQ, colA)))
        e = jax.lax.rsqrt(limit_scaling(jnp.max(jnp.abs(A_k), axis=1)))
        Q_k = Q_k * d[:, None] * d[None, :]
        A_k = A_k * e[:, None] * d[None, :]
        return Q_k, A_k, D * d, E * e

    init = (Q, A, jnp.ones((n,), dt), jnp.ones((m,), dt))
    if iters == 0:
        return init
    return jax.lax.fori_loop(0, iters, body, init)


def scale_problem(problem: Problem, scaling_iters: int,
                  ruiz_kkt: bool = False) -> ScaledProblem:
    """Scale the full problem (reference: scale_data, src/scaling.c:24-91).

    Bounds are clamped to +-QPDO_INFTY before scaling, mirroring the MATLAB
    wrapper (interfaces/mex/qpdo.m setup path).  Finite-bound masks are taken
    from the clamped-but-unscaled bounds: the reference's runtime test
    ``u < E*QPDO_INFTY`` (termination.c:131-138) is equivalent.
    """
    dt = problem.Q.dtype
    inf = jnp.asarray(_c.QPDO_INFTY, dt)
    l = jnp.clip(problem.l.astype(dt), -inf, inf)
    u = jnp.clip(problem.u.astype(dt), -inf, inf)
    l_finite = (l > -inf).astype(dt)
    u_finite = (u < inf).astype(dt)

    one = jnp.asarray(1.0, dt)
    if scaling_iters == 0:
        # scaling disabled: identity scaling, no cost scalar either
        # (reference: qpdo_setup only calls scale_data if settings->scaling,
        # qpdo.c:148-170)
        n, m = problem.Q.shape[-1], problem.A.shape[-2]
        D = jnp.ones((n,), dt)
        E = jnp.ones((m,), dt)
        A = problem.A.astype(dt)
        Q = problem.Q.astype(dt)
        q = problem.q.astype(dt)
        cost = one
    else:
        if ruiz_kkt:
            Q, A, D, E = ruiz_equilibrate_kkt(
                problem.Q.astype(dt), problem.A.astype(dt), scaling_iters)
        else:
            A, D, E = ruiz_equilibrate(problem.A.astype(dt), scaling_iters)
            # Q <- D Q D (the reference scales Q once after the A-only
            # Ruiz, scaling.c:65-71; the KKT variant scales it in-loop)
            Q = problem.Q.astype(dt) * D[:, None] * D[None, :]
        # q <- D q, then cost scalar c = 1/max(1, ||q_scaled||_inf)
        # (the Qx cache is zero at setup, scaling.c:72).
        q = problem.q.astype(dt) * D
        cost = one / jnp.maximum(one, jnp.max(jnp.abs(q)))
        q = q * cost
        Q = Q * cost
        l = E * l
        u = E * u

    scaling = Scaling(D=D, Dinv=one / D, E=E, Einv=one / E, c=cost, cinv=one / cost)
    # ||q|| in unscaled units up to the cost scalar (reference qpdo.c:163-169)
    norm_q = jnp.max(jnp.abs(scaling.Dinv * q))
    data = Problem(Q=Q, q=q, A=A, l=l, u=u, c=jnp.asarray(problem.c, dt))
    return ScaledProblem(data=data, scaling=scaling, l_finite=l_finite,
                         u_finite=u_finite, norm_q=norm_q)
