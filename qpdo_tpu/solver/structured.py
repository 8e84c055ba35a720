"""Block-angular (scenario-structured) QPDO solver.

Tensor-parallel scale-out for structured QPs (SURVEY.md §2.4/§5): problems

    minimize   0.5 x0'Q0 x0 + sum_s 0.5 xs'Qs xs + q0'x0 + sum_s qs'xs
    subject to l_s <= T_s x0 + W_s x_s <= u_s        s = 1..S

(two-stage stochastic programs, scenario MPC).  The semismooth Newton KKT
matrix is exactly arrow-structured,

    K = [[K00, B_1', ...], [B_1, K_11, 0...], ...],
    K00  = Q0 + sigma I + sum_s T_s' w_s T_s
    K0s' = B_s = W_s' w_s T_s
    K_ss = Q_s + sigma I + W_s' w_s W_s,      w_s = active_s / mu_s,

so every Newton solve is a distributed Schur complement (ops/schur.py).
Algorithm semantics are identical to the dense core (solver/core.py, which
cites the reference line-by-line); this module re-expresses the same step
on scenario-sharded arrays: leaves carry a leading S axis, and placing an
S-sharded ``jax.sharding.NamedSharding`` on the inputs makes XLA insert the
psum/all-gather collectives (the one all-reduce per Newton iteration rides
the ICI).

v1 restrictions: no Ruiz scaling (pass well-scaled data; ``scaling`` is
ignored), solved/max-iter statuses only (no infeasibility certificates).
Semantic parity with the dense solver is pinned by
tests/test_structured.py::test_matches_dense.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as _c
from ..ops.linalg import cholesky_solve
from ..ops.linesearch import pwa_root, pwa_root_bisect
from ..types import Info, Settings


class BlockAngularProblem(NamedTuple):
    Q0: jax.Array   # (n0, n0)
    Qs: jax.Array   # (S, ns, ns)
    q0: jax.Array   # (n0,)
    qs: jax.Array   # (S, ns)
    T: jax.Array    # (S, ms, n0)
    W: jax.Array    # (S, ms, ns)
    l: jax.Array    # (S, ms)
    u: jax.Array    # (S, ms)
    c: jax.Array    # scalar

    @property
    def shapes(self):
        S, ms, n0 = self.T.shape
        ns = self.W.shape[-1]
        return S, ms, n0, ns


class StructuredState(NamedTuple):
    x0: jax.Array; xs: jax.Array          # (n0,), (S, ns)
    y: jax.Array                          # (S, ms)
    Qx0: jax.Array; Qxs: jax.Array        # pure block products
    Ax: jax.Array                         # (S, ms)
    Aty0: jax.Array; Atys: jax.Array      # (n0,), (S, ns)
    x0bar: jax.Array; xsbar: jax.Array; ybar: jax.Array
    mu: jax.Array                         # (S, ms)
    sigma: jax.Array; eps_in: jax.Array
    res_prim_old: jax.Array               # (S, ms)
    tau: jax.Array
    iter: jax.Array; iter_old: jax.Array; oter: jax.Array
    status: jax.Array
    res_prim_norm: jax.Array; res_dual_norm: jax.Array
    res_prim_in_norm: jax.Array; res_dual_in_norm: jax.Array


def _norm_inf(*vs):
    return functools.reduce(jnp.maximum,
                            [jnp.max(jnp.abs(v)) for v in vs])


def _mv_A(p, x0, xs):
    """(S, ms) <- T x0 + W xs, scenario-local."""
    return (jnp.einsum("smn,n->sm", p.T, x0)
            + jnp.einsum("smk,sk->sm", p.W, xs))


def _rmv_A(p, y):
    """A' y: coupled part reduces over scenarios (the one all-reduce)."""
    return (jnp.einsum("smn,sm->n", p.T, y),
            jnp.einsum("smk,sm->sk", p.W, y))


def _mv_Q(p, x0, xs):
    return p.Q0 @ x0, jnp.einsum("sij,sj->si", p.Qs, xs)


def _arrow_newton_solve(p, active, mu, sigma, r0, rs, proximal, refine):
    """Solve the arrow KKT system via Schur complement (ops/schur.py
    algebra, inlined so XLA can shard the S axis)."""
    w = active / mu                                        # (S, ms)
    n0 = p.Q0.shape[0]
    ns = p.W.shape[-1]
    dt = p.Q0.dtype
    wT = w[..., None] * p.T                                # (S, ms, n0)
    wW = w[..., None] * p.W
    K00 = p.Q0 + jnp.einsum("smn,smk->nk", p.T, wT)
    Kss = p.Qs + jnp.einsum("smi,smj->sij", p.W, wW)
    Bs = jnp.einsum("smi,smj->sij", p.W, wT)               # (S, ns, n0)
    if proximal:
        K00 = K00 + sigma * jnp.eye(n0, dtype=dt)
        Kss = Kss + sigma * jnp.eye(ns, dtype=dt)

    def local(Kb, Bb, rb):
        rhs = jnp.concatenate([Bb, rb[:, None]], axis=1)
        sol = cholesky_solve(Kb, rhs, refine)
        return Bb.T @ sol[:, :-1], Bb.T @ sol[:, -1], sol[:, :-1], sol[:, -1]

    SB, Sr, KinvB, Kinvr = jax.vmap(local)(Kss, Bs, rs)
    S0 = K00 - jnp.sum(SB, axis=0)                         # psum over S
    rhs0 = r0 - jnp.sum(Sr, axis=0)
    dx0 = cholesky_solve(S0, rhs0, refine)
    dxs = Kinvr - jnp.einsum("sij,j->si", KinvB, dx0)
    # factorization-failure guard, mirroring the dense path
    # (ops/linalg.py): a NaN direction must not poison the state
    finite = jnp.all(jnp.isfinite(dx0)) & jnp.all(jnp.isfinite(dxs))
    return (jnp.where(finite, dx0, jnp.zeros_like(dx0)),
            jnp.where(finite, dxs, jnp.zeros_like(dxs)))


def init_structured(p: BlockAngularProblem, settings: Settings,
                    warm=None) -> StructuredState:
    S, ms, n0, ns = p.shapes
    dt = p.Q0.dtype
    sigma = jnp.asarray(settings.sigma_init, dt)
    if warm is not None:
        x0, xs, y = warm
        Qx0, Qxs = _mv_Q(p, x0, xs)
        Ax = _mv_A(p, x0, xs)
        Aty0, Atys = _rmv_A(p, y)
    else:
        x0 = jnp.zeros((n0,), dt); xs = jnp.zeros((S, ns), dt)
        y = jnp.zeros((S, ms), dt)
        Qx0 = jnp.zeros((n0,), dt); Qxs = jnp.zeros((S, ns), dt)
        Ax = jnp.zeros((S, ms), dt)
        Aty0 = jnp.zeros((n0,), dt); Atys = jnp.zeros((S, ns), dt)

    # initialize_mu (iteration.c:98-109) on the stacked residual
    Qx0_eff = Qx0 + sigma * x0 if settings.proximal else Qx0
    Qxs_eff = Qxs + sigma * xs if settings.proximal else Qxs
    f = (0.5 * (jnp.dot(x0, Qx0_eff) + jnp.sum(xs * Qxs_eff))
         + jnp.dot(p.q0, x0) + jnp.sum(p.qs * xs))
    r = Ax - jnp.clip(Ax, p.l, p.u)
    one = jnp.asarray(1.0, dt)
    mu = jnp.clip(0.1 * jnp.maximum(one, 0.5 * r * r)
                  / jnp.maximum(one, jnp.abs(f)), 1e-3, 1e3)

    zero = jnp.asarray(0.0, dt)
    i0 = jnp.asarray(0, jnp.int32)
    return StructuredState(
        x0=x0, xs=xs, y=y, Qx0=Qx0, Qxs=Qxs, Ax=Ax, Aty0=Aty0, Atys=Atys,
        x0bar=x0, xsbar=xs, ybar=y, mu=mu, sigma=sigma,
        eps_in=jnp.asarray(settings.eps_abs_in, dt),
        res_prim_old=jnp.zeros((S, ms), dt), tau=zero,
        iter=i0, iter_old=i0, oter=i0,
        status=jnp.asarray(_c.UNSOLVED, jnp.int32),
        res_prim_norm=zero, res_dual_norm=zero,
        res_prim_in_norm=zero, res_dual_in_norm=zero)


def step_structured(p: BlockAngularProblem, settings: Settings,
                    s: StructuredState) -> StructuredState:
    """One masked solver step — same control flow as core.step (which cites
    qpdo.c:343-449), on block-angular operators, without scaling and
    without infeasibility certificates."""
    dt = p.Q0.dtype
    eps_abs = jnp.asarray(settings.eps_abs, dt)

    # outer residuals (iteration.c:30-60, unscaled branch)
    res_prim = s.Ax - jnp.clip(s.Ax + s.y, p.l, p.u)
    res_dual0 = s.Qx0 + p.q0 + s.Aty0
    res_duals = s.Qxs + p.qs + s.Atys
    res_prim_norm = _norm_inf(res_prim)
    res_dual_norm = _norm_inf(res_dual0, res_duals)

    # inner residuals (iteration.c:65-93)
    w = s.Ax + s.mu * (s.ybar - 0.5 * s.y)
    res_prim_in = s.Ax + s.mu * (s.ybar - s.y) - jnp.clip(w, p.l, p.u)
    df0 = s.Qx0 + p.q0
    dfs = s.Qxs + p.qs
    if settings.proximal:
        df0 = df0 + s.sigma * (s.x0 - s.x0bar)
        dfs = dfs + s.sigma * (s.xs - s.xsbar)
    res_dual_in0 = df0 + s.Aty0
    res_dual_ins = dfs + s.Atys
    res_prim_in_norm = _norm_inf(res_prim_in)
    res_dual_in_norm = _norm_inf(res_dual_in0, res_dual_ins)

    infty = jnp.asarray(_c.QPDO_INFTY, dt)
    diverged = (res_prim_norm > infty) | (res_dual_norm > infty)
    solved = (res_prim_norm <= eps_abs) & (res_dual_norm <= eps_abs)
    status_opt = jnp.where(diverged, _c.NON_CVX,
                           jnp.where(solved, _c.SOLVED,
                                     _c.UNSOLVED)).astype(jnp.int32)
    running = status_opt == _c.UNSOLVED

    inner_opt = (res_prim_in_norm <= s.eps_in) & (res_dual_in_norm <= s.eps_in)
    inner_cap = s.iter == s.iter_old + settings.inner_max_iter
    sub_done = ((s.iter > s.iter_old + 1) & inner_opt) | inner_cap
    can_check = s.iter < s.iter_old + settings.inner_max_iter

    # --- Newton step (newton.c:13-91) on the arrow system ---
    active = ((w <= p.l) | (w >= p.u)).astype(dt)
    ytilde = (res_prim_in / s.mu) * (2.0 - active)
    At_y0, At_ys = _rmv_A(p, ytilde)
    rhs0 = -(res_dual_in0 + At_y0)
    rhss = -(res_dual_ins + At_ys)
    dx0, dxs = _arrow_newton_solve(p, active, s.mu, s.sigma, rhs0, rhss,
                                   settings.proximal, settings.refine_steps)
    Qdx0_p, Qdxs_p = _mv_Q(p, dx0, dxs)
    Qdx0 = Qdx0_p + s.sigma * dx0 if settings.proximal else Qdx0_p
    Qdxs = Qdxs_p + s.sigma * dxs if settings.proximal else Qdxs_p
    Adx = _mv_A(p, dx0, dxs)
    dy = ytilde + active * (Adx / s.mu)
    Atdy0, Atdys = _rmv_A(p, dy)

    # exact linesearch (linesearch.c:8-69) over all S*2*ms hinges
    mu_dy_half = 0.5 * s.mu * dy
    eta = 0.5 * (jnp.dot(dx0, Qdx0) + jnp.sum(dxs * Qdxs)
                 + jnp.sum(dy * mu_dy_half))
    beta = 0.5 * (jnp.dot(dx0, df0) + jnp.sum(dxs * dfs)
                  + jnp.sum(s.y * mu_dy_half))
    rsq = jax.lax.rsqrt(s.mu)
    d_half = ((Adx - mu_dy_half) * rsq).ravel()
    delta = jnp.concatenate([-d_half, d_half])
    alpha = jnp.concatenate([((w - p.l) * rsq).ravel(),
                             ((p.u - w) * rsq).ravel()])
    if settings.linesearch == "bisect":
        tau = pwa_root_bisect(eta, beta, delta, alpha)
    else:
        tau = pwa_root(eta, beta, delta, alpha)

    x0_n = s.x0 + tau * dx0
    xs_n = s.xs + tau * dxs
    y_n = s.y + tau * dy

    # --- subproblem boundary updates (iteration.c:127-180) ---
    one = jnp.asarray(1.0, dt)
    res_norm_scaled = _norm_inf(res_prim)
    abs_rp = jnp.abs(res_prim)
    mu_cond = abs_rp > jnp.maximum(eps_abs,
                                   settings.theta * jnp.abs(s.res_prim_old))
    safe_rp = jnp.where(mu_cond, abs_rp, one)
    mu_factor = one / jnp.minimum(one, settings.delta * res_norm_scaled / safe_rp)
    mu_shrunk = jnp.maximum(s.mu / mu_factor, jnp.asarray(settings.mu_min, dt))
    do_mu = (s.oter > 0) & (res_prim_norm > eps_abs)
    mu_out = jnp.where(do_mu & mu_cond, mu_shrunk, s.mu)

    do_sigma = settings.proximal & (s.oter > 0) & (res_dual_norm > eps_abs)
    sigma_out = jnp.where(do_sigma & (s.sigma > settings.sigma_min),
                          jnp.maximum(s.sigma * settings.sigma_upd,
                                      jnp.asarray(settings.sigma_min, dt)),
                          s.sigma)
    eps_in_out = jnp.where(can_check,
                           jnp.maximum(settings.rho * s.eps_in, 0.1 * eps_abs),
                           s.eps_in)

    apply_newton = running & ~sub_done
    apply_outer = running & sub_done
    advance = apply_newton | apply_outer

    def pick(newton_val, outer_val, old):
        return jnp.where(apply_newton, newton_val,
                         jnp.where(apply_outer, outer_val, old))

    return StructuredState(
        x0=pick(x0_n, s.x0, s.x0), xs=pick(xs_n, s.xs, s.xs),
        y=pick(y_n, s.y, s.y),
        Qx0=pick(s.Qx0 + tau * Qdx0_p, s.Qx0, s.Qx0),
        Qxs=pick(s.Qxs + tau * Qdxs_p, s.Qxs, s.Qxs),
        Ax=pick(s.Ax + tau * Adx, s.Ax, s.Ax),
        Aty0=pick(s.Aty0 + tau * Atdy0, s.Aty0, s.Aty0),
        Atys=pick(s.Atys + tau * Atdys, s.Atys, s.Atys),
        x0bar=pick(s.x0bar, s.x0, s.x0bar),
        xsbar=pick(s.xsbar, s.xs, s.xsbar),
        ybar=pick(s.ybar, s.y, s.ybar),
        mu=pick(s.mu, mu_out, s.mu),
        sigma=pick(s.sigma, sigma_out, s.sigma),
        eps_in=pick(s.eps_in, eps_in_out, s.eps_in),
        res_prim_old=pick(s.res_prim_old, res_prim, s.res_prim_old),
        tau=jnp.where(apply_newton, tau, s.tau),
        iter=jnp.where(advance, s.iter + 1, s.iter),
        iter_old=pick(s.iter_old, s.iter, s.iter_old),
        oter=pick(s.oter, s.oter + 1, s.oter),
        status=jnp.where(running, _c.UNSOLVED, status_opt).astype(jnp.int32),
        res_prim_norm=res_prim_norm, res_dual_norm=res_dual_norm,
        res_prim_in_norm=res_prim_in_norm, res_dual_in_norm=res_dual_in_norm)


def solve_block_angular(p: BlockAngularProblem,
                        settings: Settings = None, warm=None):
    """Full structured solve.  Returns (x0, xs, y, Info).  Shard the S axis
    of the problem leaves over a mesh to distribute; XLA inserts the
    Schur-reduction collectives."""
    settings = settings or Settings()

    with jax.default_matmul_precision(settings.matmul_precision):
        s = init_structured(p, settings, warm)

        def cond(st):
            return (st.status == _c.UNSOLVED) & (st.iter < settings.max_iter)

        s = jax.lax.while_loop(cond, lambda st: step_structured(p, settings, st), s)

        status = jnp.where(s.status == _c.UNSOLVED, _c.MAX_ITER_REACHED,
                           s.status).astype(jnp.int32)
        obj = (0.5 * (jnp.dot(s.x0, s.Qx0) + jnp.sum(s.xs * s.Qxs))
               + jnp.dot(p.q0, s.x0) + jnp.sum(p.qs * s.xs) + p.c)
        zero = jnp.asarray(0.0, p.Q0.dtype)
        info = Info(iterations=s.iter, oterations=s.oter, status_val=status,
                    res_prim_norm=s.res_prim_norm,
                    res_dual_norm=s.res_dual_norm,
                    res_prim_in_norm=s.res_prim_in_norm,
                    res_dual_in_norm=s.res_dual_in_norm,
                    objective=obj, setup_time=zero, solve_time=zero,
                    run_time=zero)
        return s.x0, s.xs, s.y, info


def to_dense_problem(p: BlockAngularProblem):
    """Assemble the equivalent dense Problem (test utility)."""
    from ..types import Problem

    S, ms, n0, ns = p.shapes
    n = n0 + S * ns
    m = S * ms
    dt = p.Q0.dtype
    Q = jnp.zeros((n, n), dt).at[:n0, :n0].set(p.Q0)
    A = jnp.zeros((m, n), dt)
    q = jnp.zeros((n,), dt).at[:n0].set(p.q0)
    for s in range(S):
        lo = n0 + s * ns
        Q = Q.at[lo:lo + ns, lo:lo + ns].set(p.Qs[s])
        q = q.at[lo:lo + ns].set(p.qs[s])
        rlo = s * ms
        A = A.at[rlo:rlo + ms, :n0].set(p.T[s])
        A = A.at[rlo:rlo + ms, lo:lo + ns].set(p.W[s])
    return Problem(Q=Q, q=q, A=A, l=p.l.ravel(), u=p.u.ravel(), c=p.c)
