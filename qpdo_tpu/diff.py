"""Differentiable QP solving: implicit differentiation through the KKT map.

No reference counterpart — the reference solver (C, /root/reference) is not
differentiable.  This module makes the *solution map* of the QP

    minimize    0.5 x' Q x + q' x
    subject to  l <= A x <= u

a first-class JAX primitive: ``qp_solve`` returns ``(x, y)`` with a
``jax.custom_vjp`` whose backward pass solves one adjoint KKT system, so the
solver composes with ``grad`` / ``vmap`` / ``jit`` — the layer pattern of
OptNet (Amos & Kolter, 2017) built on this solver's own machinery.

Derivation.  At a solution with strict complementarity, ``(x, y)`` is the
root of the piecewise-smooth KKT residual the solver terminates on
(src/iteration.c:37-59 and src/termination.c:35-77 define the same map):

    F1(x, y) = Q x + q + A' y                      (stationarity)
    F2(x, y) = A x - clip(A x + y, l, u)           (prim. feas. + compl.)

Let ``z = A x + y`` and ``act_i = 1`` iff ``z_i < l_i`` or ``z_i > u_i``
(the same activity test as newton.c:96-107 in the mu -> 0 limit).  On
inactive rows F2_i = -y_i (no data dependence); on active rows
F2_i = (A x)_i - b_i with b the touched bound.  Implicit differentiation of
F(z(theta), theta) = 0 is governed by the symmetric active-set saddle matrix

    S = [[Q + sigma_d I,  (act*A)'                  ]]
        [[act*A,          diag(-mu_d*act + (1-act))]]

(ops/linalg.saddle_solve — the same system the solution polish factors;
``mu_d``/``sigma_d`` are tiny regularizations in the roles the solver's own
mu/sigma play, types.h:164-169).  Forward mode (jvp): the solution tangent
solves  S [dx; dy] = [-(dQ x + dq + dA' y);  act*(db - dA x)]  with
``db = act_low*dl + act_up*du``.  Reverse mode (vjp): since S is symmetric,
the adjoint pair solves  S [u; v] = [gx; gy]  and the parameter cotangents
read off as

    dQ = -u x'          dq = -u           dA = -(y u' + (act*v) x')
    dl_i = v_i on active-at-lower rows    du_i = v_i on active-at-upper rows

``dQ`` is the raw (unsymmetrized) Jacobian: it matches finite differences of
a single entry.  For a symmetric parametrization of Q, symmetrize it
(``0.5 * (dQ + dQ.T)``).

Caveats: gradients are meaningful only when the forward solve converged
(status SOLVED) at a solution with strict complementarity; at weakly-active
constraints the map is nonsmooth and this returns one subgradient.  The
saddle solve refines to state-dtype accuracy (~1e-12 relative on CPU/f64,
measured; the earlier penalty-form adjoint floored at ~1e-6).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .ops.linalg import saddle_solve
from .solver.core import solve_scaled
from .solver.scaling import scale_problem
from .types import Problem, Settings


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _qp_solve(Q, q, A, l, u, settings: Settings, diff_mu: float,
              diff_sigma: float):
    sp = scale_problem(Problem(Q=Q, q=q, A=A, l=l, u=u,
                               c=jnp.zeros((), Q.dtype)),
                       settings.scaling, settings.ruiz_kkt)
    res = solve_scaled(sp, settings, None, None, False, False)
    return res.x, res.y


def _qp_solve_fwd(Q, q, A, l, u, settings, diff_mu, diff_sigma):
    x, y = _qp_solve(Q, q, A, l, u, settings, diff_mu, diff_sigma)
    return (x, y), (Q, A, l, u, x, y)


def _activity(A, x, y, l, u, dt):
    """Active set from the solution itself: z = Ax + y sits strictly
    outside [l, u] on active rows (displaced by the nonzero multiplier),
    strictly inside on inactive ones — the mu -> 0 limit of
    newton.c:96-107."""
    z = A @ x + y
    act_low = z < l
    act_up = z > u
    return act_low, act_up, (act_low | act_up).astype(dt)


def _sigma_shift(Q, diff_sigma):
    if diff_sigma == 0.0:
        return Q
    return Q + jnp.asarray(diff_sigma, Q.dtype) * jnp.eye(
        Q.shape[-1], dtype=Q.dtype)


def _qp_solve_bwd(settings, diff_mu, diff_sigma, saved, cotangents):
    Q, A, l, u, x, y = saved
    gx, gy = cotangents
    dt = x.dtype
    gx = jnp.zeros_like(x) if gx is None else gx.astype(dt)
    gy = jnp.zeros_like(y) if gy is None else gy.astype(dt)

    act_low, act_up, act = _activity(A, x, y, l, u, dt)

    # adjoint saddle solve: S is symmetric, so S [u; v] = [gx; gy] gives
    # the cotangent pair directly (module docstring)
    u_adj, v_adj = saddle_solve(_sigma_shift(Q, diff_sigma), A, act, gx, gy,
                                diff_mu,
                                refine_steps=max(settings.refine_steps, 2),
                                lu_dtype=settings.kkt_dtype)
    v_act = act * v_adj

    dQ = -jnp.outer(u_adj, x)
    dq = -u_adj
    dA = -(jnp.outer(y, u_adj) + jnp.outer(v_act, x))
    dl = jnp.where(act_low, v_adj, 0.0)
    du = jnp.where(act_up, v_adj, 0.0)
    return dQ, dq, dA, dl, du


_qp_solve.defvjp(_qp_solve_fwd, _qp_solve_bwd)


@functools.partial(jax.custom_jvp, nondiff_argnums=(5, 6, 7))
def _qp_solve_fwdmode(Q, q, A, l, u, settings: Settings, diff_mu: float,
                      diff_sigma: float):
    return _qp_solve(Q, q, A, l, u, settings, diff_mu, diff_sigma)


@_qp_solve_fwdmode.defjvp
def _qp_solve_jvp(settings, diff_mu, diff_sigma, primals, tangents):
    Q, q, A, l, u = primals
    dQ, dq, dA, dl, du = tangents
    x, y = _qp_solve_fwdmode(Q, q, A, l, u, settings, diff_mu, diff_sigma)
    dt = x.dtype

    act_low, act_up, act = _activity(A, x, y, l, u, dt)

    # tangent saddle solve (module docstring)
    r1 = -(dQ @ x + dq + dA.T @ y)
    db = jnp.where(act_low, dl, jnp.where(act_up, du, 0.0))
    r2 = act * (db - dA @ x)
    dx, dy = saddle_solve(_sigma_shift(Q, diff_sigma), A, act, r1, r2,
                          diff_mu,
                          refine_steps=max(settings.refine_steps, 2),
                          lu_dtype=settings.kkt_dtype)
    return (x, y), (dx, act * dy)


class sparse_qp_layer:
    """Differentiable LARGE-N QP layer with a fixed sparsity pattern.

    Built once from pattern carriers (scipy.sparse / BCOO / dense — only
    the nonzero patterns are kept), the layer maps the problem DATA to the
    solution:

        layer = sparse_qp_layer(Q0, A0, settings)
        x, y = layer(q_data, a_data, q, l, u)

    where ``q_data`` / ``a_data`` are the nonzero values of Q / A in the
    layer's row-sorted COO order (``layer.q_indices`` / ``layer.a_indices``,
    matching ``scipy.sparse.coo_matrix(M.tocsr())``).  All five arguments
    are differentiable: the backward pass solves the adjoint KKT system
    matrix-free by Jacobi-preconditioned CG (ops/cg.pcg) — the sparse
    analogue of ``qp_solve``'s dense adjoint, same derivation (module
    docstring); Q/A cotangents are returned as value-vectors on the
    pattern (the gradient restricted to the pattern, which is the full
    gradient whenever the pattern is structural).

    Forward runs the sparse solver (SparseOperator + CG Newton); the whole
    layer is traceable — compose with ``grad``/``jit``/``vmap`` as long as
    the pattern (and settings) stay closed over, not traced.
    """

    def __init__(self, Q, A, settings: Optional[Settings] = None, *,
                 diff_mu: Optional[float] = None, diff_sigma: float = 0.0,
                 dtype=None):
        from .solver.sparse import _as_triplets, setup_sparse

        self.settings = Settings() if settings is None else settings
        if diff_mu is None:
            diff_mu = max(float(self.settings.mu_min), 1e-8)
        self.diff_mu = float(diff_mu)
        self.diff_sigma = float(diff_sigma)
        dt = jnp.dtype(dtype) if dtype is not None else (
            jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        self.dtype = dt
        _, self.q_indices, self.q_shape = _as_triplets(Q, dt)
        _, self.a_indices, self.a_shape = _as_triplets(A, dt)

        settings_ = self.settings
        qi = self.q_indices[:, 0]
        qj = self.q_indices[:, 1]
        rows = self.a_indices[:, 0]
        cols = self.a_indices[:, 1]
        n = self.q_shape[-1]
        m = self.a_shape[0]
        q_idx, a_idx = self.q_indices, self.a_indices
        q_shape, a_shape = self.q_shape, self.a_shape
        mu_d = jnp.asarray(self.diff_mu, dt)
        sig_d = jnp.asarray(self.diff_sigma, dt)

        @jax.custom_vjp
        def f(q_data, a_data, qv, lv, uv):
            op = setup_sparse((q_data, q_idx, q_shape), qv,
                              (a_data, a_idx, a_shape), lv, uv, 0.0,
                              settings_.scaling, dt,
                              precond=settings_.precond,
                              precond_block=settings_.precond_block,
                              ruiz_kkt=settings_.ruiz_kkt)
            res = solve_scaled(op, settings_, None, None, False, False)
            return res.x, res.y

        def fwd(q_data, a_data, qv, lv, uv):
            x, y = f(q_data, a_data, qv, lv, uv)
            return (x, y), (q_data, a_data, qv, lv, uv, x, y)

        def bwd(saved, cotangents):
            q_data, a_data, qv, lv, uv, x, y = saved
            gx, gy = cotangents
            gx = jnp.zeros_like(x) if gx is None else gx.astype(dt)
            gy = jnp.zeros_like(y) if gy is None else gy.astype(dt)

            def Amv(v):
                return jnp.zeros((m,), dt).at[rows].add(a_data * v[cols])

            def Atmv(v):
                return jnp.zeros((n,), dt).at[cols].add(a_data * v[rows])

            z = Amv(x) + y
            act_low = z < lv
            act_up = z > uv
            act = (act_low | act_up).astype(dt)
            W = act / mu_d

            # adjoint Newton solve through the full sparse machinery
            # (block-Jacobi + coarse correction, or the exact banded
            # direct solve when the pattern allows) on UNSCALED data —
            # plain Jacobi CG stagnates at the adjoint's 1/diff_mu
            # conditioning
            op0 = setup_sparse((q_data, q_idx, q_shape), qv,
                               (a_data, a_idx, a_shape), lv, uv, 0.0,
                               0, dt, precond=settings_.precond,
                               precond_block=settings_.precond_block)
            st_adj = settings_.replace(
                cg_tol=min(settings_.cg_tol, 1e-10),
                cg_max_iter=max(settings_.cg_max_iter, 2000))
            rhs = gx + Atmv(W * gy)
            mu_vec = jnp.full((m,), mu_d, dt)
            u_adj = op0.newton_solve(act, mu_vec, sig_d, rhs, st_adj)
            v = W * (Amv(u_adj) - gy)

            dq_data = -u_adj[qi] * x[qj]
            da_data = -(y[rows] * u_adj[cols] + v[rows] * x[cols])
            dq = -u_adj
            dl = jnp.where(act_low, v, 0.0)
            du = jnp.where(act_up, v, 0.0)
            return dq_data, da_data, dq, dl, du

        f.defvjp(fwd, bwd)
        self._f = f

    def __call__(self, q_data, a_data, q, l, u):
        dt = self.dtype
        return self._f(jnp.asarray(q_data, dt), jnp.asarray(a_data, dt),
                       jnp.asarray(q, dt), jnp.asarray(l, dt),
                       jnp.asarray(u, dt))


def qp_solve(Q, q, A, l, u, settings: Optional[Settings] = None, *,
             diff_mu: Optional[float] = None, diff_sigma: float = 0.0,
             mode: str = "reverse"):
    """Solve the QP and return ``(x, y)``, differentiable in all five data
    arguments via implicit differentiation (one saddle solve per
    backward/tangent pass; see the module docstring for the math).

    Jittable and vmappable; ``settings`` is static (a recompile per distinct
    value).  ``mode`` selects the differentiation rule: ``"reverse"``
    (``jax.custom_vjp`` — grad/jacrev) or ``"forward"`` (``jax.custom_jvp``
    — jvp/jacfwd, the right choice for few-parameter sensitivities, e.g.
    MPC sensitivity analysis); the primal solve is identical.  ``diff_mu``
    is the dual regularization of the sensitivity saddle system (defaults
    to ``max(settings.mu_min, 1e-9)``); ``diff_sigma`` the primal one
    (default 0 — the saddle system is nonsingular already whenever Q is
    positive definite on the active set's null space).
    """
    settings = Settings() if settings is None else settings
    if diff_mu is None:
        diff_mu = max(float(settings.mu_min), 1e-9)
    if mode not in ("reverse", "forward"):
        raise ValueError("mode must be 'reverse' or 'forward'")
    fn = _qp_solve if mode == "reverse" else _qp_solve_fwdmode
    Q = jnp.asarray(Q)
    dt = Q.dtype
    return fn(Q, jnp.asarray(q, dt), jnp.asarray(A, dt),
              jnp.asarray(l, dt), jnp.asarray(u, dt),
              settings, float(diff_mu), float(diff_sigma))
