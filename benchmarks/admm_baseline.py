"""An honest OSQP-class ADMM baseline, in JAX, for same-machine comparison.

The reference method's headline claim (README.md:11-24, CITATION.cff:17-27)
is Maros-Mészáros performance against the first-order operator-splitting
solvers OSQP/QPALM — numbers that live in the paper, not the repo, and
neither solver is installed here.  This module implements the OSQP
algorithm itself (Stellato et al., "OSQP: an operator splitting solver
for quadratic programs", alg. 1: ADMM with a once-factored
quasi-definite KKT, over-relaxation, and periodic rho adaptation) as a
tuned, batched, jit/vmap-able JAX solver, so the comparison can be run
on THIS machine — CPU f64 and on-TPU — against qpdo_tpu on the same
problems with the same oracle.

This is a fair-fight baseline, not a strawman:
  - the (Q + sigma I + rho_vec A'A) system is factored ONCE per rho
    update (ADMM's structural advantage over semismooth Newton, which
    refactors every iteration) and solved by cached Cholesky,
  - over-relaxation alpha=1.6 (OSQP default),
  - per-row rho: loose/equality rows get rho*1e3 like OSQP's
    rho_eq_scale, with the standard residual-balancing update every
    ``rho_update_every`` iterations (costs one refactor, exactly as in
    OSQP),
  - termination on the same eps_abs infinity-norm residuals the qpdo
    solver uses (unscaled; eps_rel=0 to match bench.py's criterion).

Batched use: ``jax.vmap(admm_solve, in_axes=(0, None))`` over stacked
problem pytrees — the same execution shape as qpdo's solve_batch.

Usage: benchmarks/run_admm_compare.py runs the head-to-head.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ADMMSettings(NamedTuple):
    eps_abs: float = 1e-6
    max_iter: int = 20000
    sigma: float = 1e-6          # OSQP default regularization
    rho: float = 0.1             # OSQP default initial step
    alpha: float = 1.6           # over-relaxation
    rho_update_every: int = 100  # residual-balancing cadence (refactor)
    rho_updates: int = 10        # max number of refactors
    check_every: int = 25        # termination-check cadence
    # iterative-refinement sweeps on the x-update solve when the factor
    # is reduced-precision (factor_dtype="float32" with float64 data):
    # one state-dtype residual + one extra factor apply per sweep —
    # the same mixed-precision contract qpdo_tpu ships, so the TPU
    # head-to-head compares configurations both solvers would ship
    factor_refine: int = 0


class ADMMResult(NamedTuple):
    x: jax.Array
    y: jax.Array
    iterations: jax.Array
    solved: jax.Array
    res_prim: jax.Array
    res_dual: jax.Array


def _factor(Q, A, sigma, rho_vec, dt):
    n = Q.shape[-1]
    K = (Q + sigma * jnp.eye(n, dtype=Q.dtype)
         + (A.T * rho_vec[None, :]) @ A).astype(dt)
    return jnp.linalg.cholesky(K)


def _chol_solve(L, b):
    z = jax.lax.linalg.triangular_solve(L, b[..., None], left_side=True,
                                        lower=True)
    return jax.lax.linalg.triangular_solve(
        L, z, left_side=True, lower=True, transpose_a=True)[..., 0]


@functools.partial(jax.jit, static_argnames=("settings", "factor_dtype"))
def admm_solve(problem, settings: ADMMSettings = ADMMSettings(),
               factor_dtype: str | None = None) -> ADMMResult:
    """OSQP algorithm 1 on ``problem`` (a qpdo_tpu Problem pytree: Q, q,
    A, l, u).  ``factor_dtype`` optionally reduces the factorization
    precision (e.g. "float32" on TPU) while iterating in the data dtype.
    """
    Q, q, A, l, u = problem.Q, problem.q, problem.A, problem.l, problem.u
    dt = Q.dtype
    fdt = jnp.dtype(factor_dtype) if factor_dtype else dt
    m, n = A.shape
    s = settings

    eq = (u - l) <= 1e-10                      # equality rows: stiff rho
    rho0 = jnp.where(eq, s.rho * 1e3, s.rho).astype(dt)

    def factor(rho_vec):
        return _factor(Q, A, jnp.asarray(s.sigma, dt), rho_vec, fdt)

    L0 = factor(rho0)

    def kkt_res(x, z, y):
        Ax = A @ x
        rp = jnp.max(jnp.abs(Ax - z))
        rd = jnp.max(jnp.abs(Q @ x + q + A.T @ y))
        return rp, rd

    # carry: x, z, y, L, rho_vec, it, solved, rp, rd, n_refac
    def cond(c):
        x, z, y, L, rho_vec, it, solved, rp, rd, nrf = c
        return (~solved) & (it < s.max_iter)

    def body(c):
        x, z, y, L, rho_vec, it, solved, rp, rd, nrf = c
        # x-update: (Q + sigma I + rho A'A) x~ = sigma x - q + A'(rho z - y)
        rhs_dt = s.sigma * x - q + A.T @ (rho_vec * z - y)
        xt = _chol_solve(L, rhs_dt.astype(fdt)).astype(dt)
        for _ in range(s.factor_refine):
            r_corr = rhs_dt - (Q @ xt + s.sigma * xt
                               + A.T @ (rho_vec * (A @ xt)))
            xt = xt + _chol_solve(L, r_corr.astype(fdt)).astype(dt)
        zt = A @ xt
        x_new = s.alpha * xt + (1 - s.alpha) * x
        z_ax = s.alpha * zt + (1 - s.alpha) * z
        z_new = jnp.clip(z_ax + y / rho_vec, l, u)
        y_new = y + rho_vec * (z_ax - z_new)

        it = it + 1
        do_check = (it % s.check_every) == 0
        rp_new, rd_new = jax.lax.cond(
            do_check, lambda: kkt_res(x_new, z_new, y_new),
            lambda: (rp, rd))
        solved_new = do_check & (jnp.maximum(rp_new, rd_new) <= s.eps_abs)

        # residual-balancing rho update (costs one refactor, like OSQP)
        do_rho = ((it % s.rho_update_every) == 0) & (nrf < s.rho_updates) \
            & ~solved_new
        scale = jnp.sqrt((rp_new + 1e-30) / (rd_new + 1e-30))
        scale = jnp.clip(scale, 0.1, 10.0)
        big = (scale > 5.0) | (scale < 0.2)    # OSQP: update only if off
        rho_next = jnp.where(do_rho & big, rho_vec * scale, rho_vec)
        L_next, nrf = jax.lax.cond(
            do_rho & big, lambda: (factor(rho_next), nrf + 1),
            lambda: (L, nrf))
        return (x_new, z_new, y_new, L_next, rho_next, it, solved_new,
                rp_new, rd_new, nrf)

    x0 = jnp.zeros(n, dt)
    z0 = jnp.zeros(m, dt)
    y0 = jnp.zeros(m, dt)
    inf = jnp.asarray(jnp.inf, dt)
    c = (x0, z0, y0, L0, rho0, jnp.asarray(0, jnp.int32),
         jnp.asarray(False), inf, inf, jnp.asarray(0, jnp.int32))
    x, z, y, L, rho_vec, it, solved, rp, rd, nrf = jax.lax.while_loop(
        cond, body, c)
    rp_f, rd_f = kkt_res(x, z, y)
    return ADMMResult(x=x, y=y, iterations=it,
                      solved=jnp.maximum(rp_f, rd_f) <= s.eps_abs,
                      res_prim=rp_f, res_dual=rd_f)
