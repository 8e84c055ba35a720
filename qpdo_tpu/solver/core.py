"""Core QPDO iteration: the primal-dual Newton proximal method as one pure
``lax.while_loop`` step.

TPU-native re-design of the reference hot loop (src/qpdo.c:304-476 plus
src/iteration.c, src/newton.c, src/termination.c).  Differences from the
reference that preserve semantics but change the mechanism:

- The per-problem adaptive control flow (inner Newton step vs. outer prox
  update vs. break) is re-expressed as masked, divergence-free updates: both
  branches are computed every iteration and combined with ``jnp.where``.
  This is what makes the whole solver ``vmap``-able in lock-step across a
  batch of QPs — the primary TPU scaling axis.
- The KKT matrix is re-formed and re-factorized every Newton iteration
  (ops/linalg.py) instead of CHOLMOD rank-1 up/downdates; consequently
  ``update_mu`` needs no factor repair (the reference's
  ldlupdate_mu_changed, src/cholmod_interface.c:77-93, has no equivalent).
- Status is latched per problem: once a problem leaves UNSOLVED its state is
  frozen exactly, so converged problems in a batch take no-op steps.
- The Qx cache stores the *pure* product Q@x; the reference folds sigma*x
  into it when proximal (qpdo.c:249).  All formulas below add the sigma
  terms explicitly, which is algebraically identical.

The step is written against the operator protocol of ``qpdo_tpu.operators``:
primal/dual vectors are pytrees and all matrix products go through the
operator, so the same code drives the dense path (``DenseOperator``), the
large-n sparse-CG path (``SparseOperator``), and the block-angular
distributed path (``BlockAngularOperator``).  For the dense single-leaf
case every tree helper below lowers to exactly the direct array op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import constants as _c
from ..operators import (DenseOperator, tany, tcast, tdot, tmap,
                         tnorm_inf, tsum)
from ..ops.linesearch import exact_linesearch
from ..types import Info, Result, ScaledProblem, Settings, SolverState


def as_operator(sp_or_op):
    """Accept a ScaledProblem (wrapped in a DenseOperator) or any operator."""
    if isinstance(sp_or_op, ScaledProblem):
        return DenseOperator(sp=sp_or_op)
    return sp_or_op


def _with_matmul_precision(fn):
    """Trace the wrapped function under settings.matmul_precision.

    All core entry points take (op, settings, ...) so the context can be
    derived from the second argument.  Without this, TPU float32 matmuls
    run as single-pass bfloat16 and the 1e-3/1e-6 tolerances sit inside
    matmul noise."""
    @functools.wraps(fn)
    def wrapped(op, settings, *args, **kwargs):
        with jax.default_matmul_precision(settings.matmul_precision):
            return fn(op, settings, *args, **kwargs)
    return wrapped


# ---------------------------------------------------------------------------
# Warm start / state initialization (reference: qpdo_warm_start, qpdo.c:217-299)
# ---------------------------------------------------------------------------

@_with_matmul_precision
def init_state(op, settings: Settings,
               x0, y0, warm_x: bool, warm_y: bool) -> SolverState:
    op = as_operator(op)
    dt = op.dtype
    sigma = jnp.asarray(settings.sigma_init, dt)

    if warm_x:
        x = tmap(lambda Dinv, v: Dinv * v.astype(dt), op.Dinv, x0)  # qpdo.c:237-242
        Qx = op.Qmv(x)
        Ax = op.Amv(x)
    else:
        x = op.zeros_primal()
        Qx = op.zeros_primal()
        Ax = op.zeros_dual()

    if warm_y:
        cost = op.cost
        y = tmap(lambda Einv, v: cost * (Einv * v.astype(dt)), op.Einv, y0)  # qpdo.c:268-274
        Aty = op.Atmv(y)
    else:
        y = op.zeros_dual()
        Aty = op.zeros_primal()

    # initialize_mu — Birgin-Martinez balancing (iteration.c:98-109).  The
    # reference's Qx cache includes sigma*x when proximal, so f does too.
    if settings.proximal:
        Qx_eff = tmap(lambda a, b: a + sigma * b, Qx, x)
    else:
        Qx_eff = Qx
    f = 0.5 * tdot(x, Qx_eff) + tdot(op.q, x)
    one = jnp.asarray(1.0, dt)
    fmax = jnp.maximum(one, jnp.abs(f))
    mu = tmap(
        lambda Ax1, l1, u1: jnp.clip(
            0.1 * jnp.maximum(one, 0.5 * jnp.square(Ax1 - jnp.clip(Ax1, l1, u1)))
            / fmax, 1e-3, 1e3),
        Ax, op.l, op.u)

    if (warm_x or warm_y) and settings.warm_mu_adapt:
        # TPU extension (no reference equivalent): scale the initial
        # penalties by the warm point's own KKT residual.  The
        # Birgin-Martinez formula floors mu at 1e-3 regardless of warm
        # quality, which makes the first subproblems *move away* from a
        # near-optimal warm start and re-converge from scratch (~100
        # wasted iterations in the MPC re-solve workflow); a near-optimal
        # point justifies near-final penalties.  A bad warm point (large
        # residual) keeps scale 1 and reference behaviour.
        cinv = op.cinv
        y_term = tmap(lambda E, v: (E * E / op.cost) * v, op.E, y)
        rp0 = tnorm_inf(tmap(
            lambda Einv, Ax1, yt, l1, u1: Einv * (Ax1 - jnp.clip(Ax1 + yt, l1, u1)),
            op.Einv, Ax, y_term, op.l, op.u))
        rd0 = tnorm_inf(tmap(lambda Dinv, Qx1, q1, Aty1: Dinv * (Qx1 + q1 + Aty1),
                             op.Dinv, Qx, op.q, Aty)) / op.cost
        quality = jnp.maximum(rp0, rd0)
        mu_scale = jnp.clip(quality, settings.warm_mu_scale_min, 1.0)
        mu = tmap(lambda m: jnp.maximum(m * mu_scale,
                                        jnp.asarray(settings.mu_min, dt)), mu)

    zero = jnp.asarray(0.0, dt)
    i0 = jnp.asarray(0, jnp.int32)
    kkt_cache = None
    if ((settings.kkt_update_rows > 0
         or settings.kkt_solver in ("inv", "ns"))
            and hasattr(op, "kkt_cache_init")):
        # initial cache from the init-state active set (w with ybar = y,
        # the same test step() applies, newton.c:96-107)
        w0 = tmap(lambda Ax1, mu1, y1: Ax1 + 0.5 * mu1 * y1, Ax, mu, y)
        active0 = tmap(lambda wv, l, u: ((wv <= l) | (wv >= u)).astype(dt),
                       w0, op.l, op.u)
        kkt_cache = op.kkt_cache_init(active0, mu, settings, sigma=sigma)
    return SolverState(
        x=x, y=y, Qx=Qx, Ax=Ax, Aty=Aty, dx_prev=op.zeros_primal(),
        xbar=x, ybar=y, mu=mu,
        sigma=sigma, eps_in=jnp.asarray(settings.eps_abs_in, dt),
        res_prim_old=op.zeros_dual(), tau=zero,
        iter=i0, iter_old=i0, oter=i0,
        status=jnp.asarray(_c.UNSOLVED, jnp.int32),
        res_prim_norm=zero, res_dual_norm=zero,
        res_prim_in_norm=zero, res_dual_in_norm=zero,
        kkt_cache=kkt_cache, warmup_iter=i0)


# ---------------------------------------------------------------------------
# One masked solver step (the body of the main loop, qpdo.c:343-449)
# ---------------------------------------------------------------------------

def outer_residuals(op, y, Qx, Ax, Aty):
    """Outer residual vectors + unscaled norms at an arbitrary iterate
    (iteration.c:30-60; norms termination.c:35-53):
    res_prim = Ax - proj_[l,u](Ax + E*(E*y)*cinv)   [scaled space]."""
    cinv = op.cinv
    res_prim = tmap(
        lambda Ax1, E, y1, l, u: Ax1 - jnp.clip(Ax1 + (E * E * cinv) * y1, l, u),
        Ax, op.E, y, op.l, op.u)
    res_dual = tmap(lambda Qx1, q, Aty1: Qx1 + q + Aty1, Qx, op.q, Aty)
    rp = tnorm_inf(tmap(jnp.multiply, op.Einv, res_prim))
    rd = tnorm_inf(tmap(jnp.multiply, op.Dinv, res_dual)) * cinv
    return res_prim, res_dual, rp, rd


@_with_matmul_precision
def step(op, settings: Settings, s: SolverState) -> SolverState:
    op = as_operator(op)
    dt = op.dtype
    one = jnp.asarray(1.0, dt)
    eps_abs = jnp.asarray(settings.eps_abs, dt)
    cinv = op.cinv
    cost = op.cost
    sigma = s.sigma

    # The whole residual block (outer/inner residuals, w, active, norms)
    # can run as ONE fused Pallas launch on the dense path
    # (Settings.pallas_residuals; ops/pallas_residuals.py) — the in-loop
    # integration of the round-3 standalone-measured kernel.  TPU Pallas
    # has no float64, so on device it engages only in float32 phases
    # (the hybrid warmup, ~97% of bench iterations); interpret mode on
    # CPU keeps it testable.
    _on_cpu = jax.default_backend() == "cpu"
    use_pallas_res = (settings.pallas_residuals
                      and isinstance(op, DenseOperator)
                      and (_on_cpu or dt == jnp.dtype(jnp.float32)))
    active_pl = None
    if use_pallas_res:
        from ..ops.pallas_residuals import fused_residuals
        sig_eff = sigma if settings.proximal else jnp.zeros((), dt)
        (res_prim, res_prim_in, w, active_pl, res_dual_in,
         res_prim_norm, res_dual_norm, res_prim_in_norm,
         res_dual_in_norm) = (a[0] for a in fused_residuals(
             s.Ax[None], s.y[None], s.mu[None], s.ybar[None],
             op.l[None], op.u[None], op.E[None], op.Einv[None],
             s.Qx[None], op.q[None], s.Aty[None], s.x[None], s.xbar[None],
             op.Dinv[None], jnp.reshape(sig_eff, (1,)),
             jnp.reshape(cinv, (1,)), interpret=_on_cpu))
        # the linesearch consumes df = Qx + q + sigma (x - xbar); the
        # kernel returns res_dual_in = df + Aty, so recover df exactly
        df = res_dual_in - s.Aty
    else:
        res_prim, res_dual, res_prim_norm, res_dual_norm = outer_residuals(
            op, s.y, s.Qx, s.Ax, s.Aty)

        # ---- inner residuals (iteration.c:65-93; norms termination.c:58-77) ----
        w = tmap(lambda Ax, mu, ybar, y: Ax + mu * (ybar - 0.5 * y),
                 s.Ax, s.mu, s.ybar, s.y)
        res_prim_in = tmap(
            lambda Ax, mu, ybar, y, wv, l, u: Ax + mu * (ybar - y) - jnp.clip(wv, l, u),
            s.Ax, s.mu, s.ybar, s.y, w, op.l, op.u)
        if settings.proximal:
            df = tmap(lambda Qx, q, x, xbar: Qx + q + sigma * (x - xbar),
                      s.Qx, op.q, s.x, s.xbar)
        else:
            df = tmap(lambda Qx, q: Qx + q, s.Qx, op.q)
        res_dual_in = tmap(jnp.add, df, s.Aty)
        res_prim_in_norm = tnorm_inf(tmap(jnp.multiply, op.Einv, res_prim_in))
        res_dual_in_norm = tnorm_inf(tmap(jnp.multiply, op.Dinv, res_dual_in)) * cinv

    # ---- outer optimality / divergence (termination.c:11-23) ----
    # In mixed-GEMM mode the caches carry bounded reduced-precision drift
    # between anchors (run_loop), so the SOLVED latch keeps a 10% margin:
    # internal residual <= 0.9*eps + drift << eps  =>  true residual <= eps.
    infty = jnp.asarray(_c.QPDO_INFTY, dt)
    mixed_mode = (settings.phase2_gemm_dtype is not None
                  and jnp.dtype(settings.phase2_gemm_dtype) != dt
                  and hasattr(op, "Amv_mixed"))
    eps_latch = eps_abs * 0.9 if mixed_mode else eps_abs
    diverged = (res_prim_norm > infty) | (res_dual_norm > infty)
    solved = (res_prim_norm <= eps_latch) & (res_dual_norm <= eps_latch)
    status_opt = jnp.where(
        diverged, _c.NON_CVX,
        jnp.where(solved, _c.SOLVED, _c.UNSOLVED)).astype(jnp.int32)
    running = status_opt == _c.UNSOLVED

    # ---- subproblem transition test (qpdo.c:365) ----
    inner_opt = (res_prim_in_norm <= s.eps_in) & (res_dual_in_norm <= s.eps_in)
    inner_cap = s.iter == s.iter_old + settings.inner_max_iter
    sub_done = ((s.iter > s.iter_old + 1) & inner_opt) | inner_cap
    can_check = s.iter < s.iter_old + settings.inner_max_iter

    # =======================================================================
    # Branch A: Newton step (computed unconditionally; masked in at the end)
    # =======================================================================
    # active set as weights (newton.c:96-107); the fused residual kernel
    # already computed it in the same launch
    active = active_pl if active_pl is not None else tmap(
        lambda wv, l, u: ((wv <= l) | (wv >= u)).astype(dt),
        w, op.l, op.u)
    # rhs: ytilde = (I+P) res_prim_in / mu (doubled on inactive rows),
    # rhs = -(res_dual_in + A' ytilde)   (newton.c:37-45)
    ytilde = tmap(lambda r, mu, a: (r / mu) * (2.0 - a),
                  res_prim_in, s.mu, active)

    # The infeasibility-check directions are known before the Newton solve,
    # so their matvecs ride along in stacked GEMMs (2-column right-hand
    # sides) — on TPU each state-dtype GEMM call is expensive, and the
    # masked lock-step design computes branch B every iteration anyway.
    check_inf = settings.eps_prim_inf > 0 or settings.eps_dual_inf > 0
    dy_c = tmap(jnp.subtract, s.y, s.ybar)  # primal certificate direction
    dx_c = tmap(jnp.subtract, s.x, s.xbar)  # dual certificate direction

    # Reduced-precision matvecs where the error analysis allows it (the
    # state dtype may be emulated float64 on TPU, ~3ms per GEMM):
    # - A'ytilde feeds the Newton rhs, whose accuracy is already bounded by
    #   the kkt_dtype refinement.
    # - Q dx feeds the linesearch and the Qx cache increment tau*Qdx; the
    #   increment's absolute error is eps(kdt)*||Q||*||dx||, which summed
    #   over the solve path stays far below eps_abs.
    # Everything dividing by mu (A dx -> dy, newton.c:60-63) or feeding the
    # eps-relative infeasibility tests stays in the state dtype.
    kdt = jnp.dtype(settings.kkt_dtype) if settings.kkt_dtype else dt
    # Reduced-precision CACHE-feeding matvecs (Qdx for the Qx cache, the
    # rhs A'ytilde) are only safe on operators with the anchored
    # re-exactification machinery (DenseOperator.Amv_mixed et al.): on
    # matrix-free operators the increments would accumulate unmanaged
    # drift — measured fatal on scale-stressed data (internal rd 1e-8 vs
    # true 1.4e-3, CVXQP1S with kkt_dtype=float32) — and their O(nnz)
    # exact cost is negligible next to the CG solve they feed.
    ckdt = kdt if hasattr(op, "Amv_mixed") else dt
    # anchored phase 2: reduced-precision A-GEMMs with exact hard rows
    # (Settings.phase2_gemm_dtype); certificates default to the same dtype
    mixed = (settings.phase2_gemm_dtype is not None
             and jnp.dtype(settings.phase2_gemm_dtype) != dt
             and hasattr(op, "Amv_mixed"))
    pdt = jnp.dtype(settings.phase2_gemm_dtype) if mixed else None
    cert_dt = settings.cert_dtype or settings.phase2_gemm_dtype
    cdt = jnp.dtype(cert_dt) if cert_dt else dt
    split_certs = check_inf and cdt != dt
    # fused-rhs mode (Settings.fused_newton_rhs): skip the standalone
    # A'ytilde dispatch — it rides the formation GEMM inside newton_solve
    # as one extra column (op-count cut for MXU-op-rate-bound parts).
    fused_rhs = (settings.fused_newton_rhs
                 and isinstance(op, DenseOperator)
                 and s.kkt_cache is None)
    if fused_rhs:
        dx = op.newton_solve(active, s.mu, sigma, None, settings,
                             dx_prev=s.dx_prev, tol_hint=s.eps_in,
                             ytilde=ytilde, res_dual_in=res_dual_in)
        kkt_cache_new = s.kkt_cache
    else:
        At_ytilde = op.Atmv(ytilde, dtype=ckdt)
        rhs = tmap(lambda rd, aty: -(rd + aty), res_dual_in, At_ytilde)
        if s.kkt_cache is not None and hasattr(op, "newton_solve_cached"):
            dx, kkt_cache_new = op.newton_solve_cached(
                active, s.mu, sigma, rhs, settings, s.kkt_cache,
                dx_prev=s.dx_prev, tol_hint=s.eps_in)
        else:
            dx = op.newton_solve(active, s.mu, sigma, rhs, settings,
                                 dx_prev=s.dx_prev, tol_hint=s.eps_in)
            kkt_cache_new = s.kkt_cache
    if mixed:
        Qdx_pure = op.Qmv(dx, dtype=ckdt)
        Adx = op.Amv_mixed(dx, s.mu, settings.hard_rows, pdt)
        if check_inf:
            Adx_c_raw = op.Amv(dx_c, dtype=cdt)
            Qdx_c = op.Qmv(dx_c, dtype=cdt)
        else:
            Qdx_c = Adx_c_raw = Atdy_c_raw = None
    elif split_certs:
        # certificate columns in reduced precision, un-stacked from the
        # state-dtype GEMMs (see Settings.cert_dtype)
        Qdx_pure = op.Qmv(dx, dtype=ckdt)
        Adx = op.Amv(dx)
        Adx_c_raw = op.Amv(dx_c, dtype=cdt)
        Qdx_c = op.Qmv(dx_c, dtype=cdt)
    elif check_inf:
        if jnp.dtype(ckdt) == jnp.dtype(dt) and hasattr(op, "QAmv2"):
            # all four direction images ride ONE stacked GEMM
            # [Q; A] @ [dx | dx_c] — 3 MXU dispatches cut to 1 (same
            # O(eps||M||||x||) error class, not bit-identical)
            Qdx_pure, Qdx_c, Adx, Adx_c_raw = op.QAmv2(dx, dx_c)
        elif jnp.dtype(ckdt) == jnp.dtype(dt):
            # operators without the dense concat trick still stack pairs
            Qdx_pure, Qdx_c = op.Qmv2(dx, dx_c)
            Adx, Adx_c_raw = op.Amv2(dx, dx_c)
        else:
            Qdx_pure = op.Qmv(dx, dtype=ckdt)
            Qdx_c = op.Qmv(dx_c)
            Adx, Adx_c_raw = op.Amv2(dx, dx_c)
    else:
        Qdx_pure = op.Qmv(dx, dtype=ckdt)
        Adx = op.Amv(dx)
        Qdx_c = Adx_c_raw = Atdy_c_raw = None
    if settings.proximal:
        Qdx = tmap(lambda a, b: a + sigma * b, Qdx_pure, dx)
    else:
        Qdx = Qdx_pure
    dy = tmap(lambda yt, a, adx, mu: yt + a * (adx / mu),
              ytilde, active, Adx, s.mu)               # newton.c:60-63
    if mixed:
        Atdy = op.Atmv_mixed(dy, s.mu, settings.hard_rows, pdt)
        if check_inf:
            Atdy_c_raw = op.Atmv(dy_c, dtype=cdt)
    elif split_certs:
        Atdy = op.Atmv(dy)
        Atdy_c_raw = op.Atmv(dy_c, dtype=cdt)
    elif check_inf:
        Atdy, Atdy_c_raw = op.Atmv2(dy, dy_c)
    else:
        Atdy = op.Atmv(dy)
    tau = exact_linesearch(dx, dy, Qdx, Adx, df, s.y, w, s.mu, op.l, op.u,
                           settings.linesearch, settings.linesearch_dtype)
    exact_newton = getattr(op, "newton_exact", lambda _s: True)(settings)
    if settings.newton_full_step and exact_newton:
        # Full-step acceptance: evaluate the inner residual at tau=1 from
        # the cache increments alone (elementwise only, no GEMMs) and
        # override the linesearch when the full Newton step shrinks it by
        # full_step_gamma.  See Settings.newton_full_step.  Only sound
        # for exact (direct-solve) Newton directions — see
        # SparseOperator.newton_exact.
        x_t = tmap(jnp.add, s.x, dx)
        y_t = tmap(jnp.add, s.y, dy)
        Ax_t = tmap(jnp.add, s.Ax, Adx)
        Qx_t = tmap(jnp.add, s.Qx, Qdx_pure)
        Aty_t = tmap(jnp.add, s.Aty, Atdy)
        w_t = tmap(lambda Axv, mu, ybar, yv: Axv + mu * (ybar - 0.5 * yv),
                   Ax_t, s.mu, s.ybar, y_t)
        rpi_t = tmap(
            lambda Axv, mu, ybar, yv, wv, l, u:
            Axv + mu * (ybar - yv) - jnp.clip(wv, l, u),
            Ax_t, s.mu, s.ybar, y_t, w_t, op.l, op.u)
        if settings.proximal:
            df_t = tmap(lambda Qxv, q1, xv, xbar: Qxv + q1 + sigma * (xv - xbar),
                        Qx_t, op.q, x_t, s.xbar)
        else:
            df_t = tmap(lambda Qxv, q1: Qxv + q1, Qx_t, op.q)
        rdi_t = tmap(jnp.add, df_t, Aty_t)
        rpi_t_norm = tnorm_inf(tmap(jnp.multiply, op.Einv, rpi_t))
        rdi_t_norm = tnorm_inf(tmap(jnp.multiply, op.Dinv, rdi_t)) * cinv
        cur = jnp.maximum(res_prim_in_norm, res_dual_in_norm)
        trial = jnp.maximum(rpi_t_norm, rdi_t_norm)
        take_full = (trial <= settings.full_step_gamma * cur) & (tau < one)
        tau = jnp.where(take_full, one, tau)
    # iterate + cache updates (iteration.c:19-24); Qx cache is pure Q@x here
    axpy = lambda v, d: tmap(lambda a, b: a + tau * b, v, d)
    x_nwt = axpy(s.x, dx)
    y_nwt = axpy(s.y, dy)
    Qx_nwt = axpy(s.Qx, Qdx_pure)
    Ax_nwt = axpy(s.Ax, Adx)
    Aty_nwt = axpy(s.Aty, Atdy)

    # =======================================================================
    # Branch B: subproblem boundary — infeasibility checks + prox update
    # =======================================================================
    if check_inf:
        # primal infeasibility via dy = y - ybar (termination.c:97-151)
        norm_Edy = tnorm_inf(tmap(jnp.multiply, op.E, dy_c))
        Atdy_c_norm = tnorm_inf(tmap(jnp.multiply, op.Dinv, Atdy_c_raw))
        oob = tsum(tmap(
            lambda u, l, d, uf, lf: u * jnp.maximum(d, 0.0) * uf
            + l * jnp.minimum(d, 0.0) * lf,
            op.u, op.l, dy_c, op.u_finite, op.l_finite))
        eps_pinf = jnp.asarray(settings.eps_prim_inf, dt)
        prim_inf = ((norm_Edy > 0)
                    & (Atdy_c_norm <= eps_pinf * norm_Edy)
                    & (oob <= -eps_pinf * norm_Edy))
        prim_inf &= can_check & (settings.eps_prim_inf > 0)

        # dual infeasibility via dx = x - xbar (termination.c:156-216)
        norm_Ddx = tnorm_inf(tmap(jnp.multiply, op.D, dx_c))
        eps_dinf = jnp.asarray(settings.eps_dual_inf, dt)
        thr = eps_dinf * norm_Ddx
        rows_bad = tany(tmap(
            lambda Einv, adx, uf, lf: (uf * (Einv * adx >= thr) > 0)
            | (lf * (Einv * adx <= -thr) > 0),
            op.Einv, Adx_c_raw, op.u_finite, op.l_finite))
        if settings.proximal:
            # quirk preserved from termination.c:200-202: - sigma*tau*dx
            Qdx_c = tmap(lambda qd, d: qd - sigma * s.tau * d, Qdx_c, dx_c)
        dual_inf = ((norm_Ddx > 0) & ~rows_bad
                    & (tnorm_inf(Qdx_c) <= cost * thr)
                    & (tdot(op.q, dx_c) <= -cost * thr))
        dual_inf &= can_check & (settings.eps_dual_inf > 0) & ~prim_inf
    else:
        prim_inf = jnp.asarray(False)
        dual_inf = jnp.asarray(False)

    # mu update (iteration.c:127-168), gated on oter>0 and outer primal
    # residual still above tolerance (qpdo.c:400-402)
    res_norm_scaled = tnorm_inf(res_prim)
    mu_min = jnp.asarray(settings.mu_min, dt)

    do_mu = (s.oter > 0) & (res_prim_norm > eps_abs)

    def mu_update(mu, rp, rp_old):
        abs_rp = jnp.abs(rp)
        cond = abs_rp > jnp.maximum(eps_abs, settings.theta * jnp.abs(rp_old))
        safe_rp = jnp.where(cond, abs_rp, one)
        factor = one / jnp.minimum(one, settings.delta * res_norm_scaled / safe_rp)
        shrunk = jnp.maximum(mu / factor, mu_min)
        return jnp.where(do_mu & cond, shrunk, mu)

    mu_out = tmap(mu_update, s.mu, res_prim, s.res_prim_old)

    # sigma update (iteration.c:173-180), gated at qpdo.c:403-405
    do_sigma = settings.proximal & (s.oter > 0) & (res_dual_norm > eps_abs)
    sigma_shrunk = jnp.maximum(sigma * settings.sigma_upd,
                               jnp.asarray(settings.sigma_min, dt))
    sigma_out = jnp.where(do_sigma & (sigma > settings.sigma_min),
                          sigma_shrunk, sigma)

    # prox-center update: plain recenter at the iterate (qpdo.c:396-397),
    # or the safeguarded inertial extrapolation (Settings.accel_gamma)
    if settings.accel_gamma > 0:
        ot = s.oter.astype(dt)
        gk = jnp.asarray(settings.accel_gamma, dt) * ot / (ot + 3.0)
        rp_prev_norm = tnorm_inf(tmap(jnp.multiply, op.Einv, s.res_prim_old))
        ok = can_check & (s.oter > 0) & (res_prim_norm <= rp_prev_norm)
        gk = jnp.where(ok, gk, jnp.asarray(0.0, dt))
        xbar_new = tmap(lambda zv, zb: zv + gk * (zv - zb), s.x, s.xbar)
        ybar_new = tmap(lambda zv, zb: zv + gk * (zv - zb), s.y, s.ybar)
    else:
        xbar_new, ybar_new = s.x, s.y

    # inner tolerance shrink, only when the subproblem converged before the
    # iteration cap (qpdo.c:407-410)
    eps_in_out = jnp.where(
        can_check,
        jnp.maximum(settings.rho * s.eps_in, 0.1 * eps_abs),
        s.eps_in)

    # ---- warmup stall guard (phase 1 only; Settings.warmup_stall_exit) ----
    # At an outer boundary, res_prim_old still holds the residual vector of
    # the PREVIOUS outer update: no sufficient decrease across a full outer
    # cycle means the mu schedule is pinned at the warmup mu floor and
    # phase 1 cannot make progress — latch WARMUP_STALLED so upcast_state
    # hands the problem to the accurate phase now.
    if settings.stall_exit > 0:
        prev_rp_norm = tnorm_inf(tmap(jnp.multiply, op.Einv, s.res_prim_old))
        warmup_stalled = ((s.oter >= 2)
                          & (res_prim_norm > settings.stall_exit
                             * prev_rp_norm)
                          & (res_prim_norm > eps_abs))
    else:
        warmup_stalled = jnp.asarray(False)

    # =======================================================================
    # Combine branches with masks
    # =======================================================================
    infeasible = prim_inf | dual_inf
    apply_newton = running & ~sub_done
    apply_outer = running & sub_done & ~infeasible & ~warmup_stalled
    advance = apply_newton | apply_outer       # i.e. no break this iteration

    status_next = jnp.where(
        running,
        jnp.where(sub_done & prim_inf, _c.PRIMAL_INFEASIBLE,
                  jnp.where(sub_done & dual_inf, _c.DUAL_INFEASIBLE,
                            jnp.where(sub_done & warmup_stalled,
                                      _c.WARMUP_STALLED, _c.UNSOLVED))),
        status_opt).astype(jnp.int32)

    def pick(newton_val, outer_val, old):
        return tmap(
            lambda nv, ov, o: jnp.where(apply_newton, nv,
                                        jnp.where(apply_outer, ov, o)),
            newton_val, outer_val, old)

    return SolverState(
        x=pick(x_nwt, s.x, s.x),
        y=pick(y_nwt, s.y, s.y),
        Qx=pick(Qx_nwt, s.Qx, s.Qx),
        Ax=pick(Ax_nwt, s.Ax, s.Ax),
        Aty=pick(Aty_nwt, s.Aty, s.Aty),
        dx_prev=pick(dx, s.dx_prev, s.dx_prev),
        xbar=pick(s.xbar, xbar_new, s.xbar),  # prox center (qpdo.c:396)
        ybar=pick(s.ybar, ybar_new, s.ybar),
        mu=pick(s.mu, mu_out, s.mu),
        sigma=pick(s.sigma, sigma_out, s.sigma),
        eps_in=pick(s.eps_in, eps_in_out, s.eps_in),
        res_prim_old=pick(s.res_prim_old, res_prim, s.res_prim_old),
        tau=jnp.where(apply_newton, tau, s.tau),
        iter=jnp.where(advance, s.iter + 1, s.iter),
        iter_old=pick(s.iter_old, s.iter, s.iter_old),
        oter=pick(s.oter, s.oter + 1, s.oter),
        status=status_next,
        res_prim_norm=res_prim_norm,
        res_dual_norm=res_dual_norm,
        res_prim_in_norm=res_prim_in_norm,
        res_dual_in_norm=res_dual_in_norm,
        # the cache advances only on Newton steps (outer/frozen steps did
        # not factor); None stays None (tree.map skips empty subtrees)
        kkt_cache=pick(kkt_cache_new, s.kkt_cache, s.kkt_cache),
        warmup_iter=s.warmup_iter,
    )


# ---------------------------------------------------------------------------
# Full solve on scaled data
# ---------------------------------------------------------------------------

def objective_value(op, x, Qx):
    """0.5 x'Qx + q'x, unscaled (compute_objective, iteration.c:185-221)."""
    op = as_operator(op)
    obj = 0.5 * tdot(x, Qx) + tdot(op.q, x)
    return obj * op.cinv + op.c


def rebuild_kkt_cache(op, settings: Settings, s: SolverState) -> SolverState:
    """Full rebuild of the incremental-KKT cache from the current state
    (the chunk-cadence analogue of the reference's periodic full
    refactorization, newton.c:21-24): resets the staleness of the rows
    beyond the per-iteration top-k updates."""
    op = as_operator(op)
    if ((settings.kkt_update_rows <= 0
         and settings.kkt_solver not in ("inv", "ns"))
            or not hasattr(op, "kkt_cache_init")):
        return s
    if (settings.kkt_solver in ("inv", "ns")
            and settings.kkt_update_rows <= 0
            and not settings.kkt_inv_refresh):
        return s  # init-only inverse: NS tracking carries X
    dt = op.dtype
    w = tmap(lambda Ax1, mu1, ybar1, y1: Ax1 + mu1 * (ybar1 - 0.5 * y1),
             s.Ax, s.mu, s.ybar, s.y)
    active = tmap(lambda wv, l, u: ((wv <= l) | (wv >= u)).astype(dt),
                  w, op.l, op.u)
    return s._replace(kkt_cache=op.kkt_cache_init(active, s.mu, settings,
                                                  sigma=s.sigma))


def reanchor(op, settings: Settings, s: SolverState) -> SolverState:
    """Recompute the Qx/Ax/Aty caches with exact state-dtype matvecs
    ("anchor" of the mixed-GEMM phase 2): resets the reduced-precision
    increment drift accumulated since the previous anchor.  Also rebuilds
    the incremental-KKT cache when it is carried."""
    op = as_operator(op)
    s = s._replace(Qx=op.Qmv(s.x), Ax=op.Amv(s.x), Aty=op.Atmv(s.y))
    return rebuild_kkt_cache(op, settings, s)


@_with_matmul_precision
def run_loop(op, settings: Settings, s: SolverState, iter_cap) -> SolverState:
    """Iterate until the status latches or ``iter`` reaches ``iter_cap``
    (the main loop, qpdo.c:343-449).  ``iter_cap`` may be traced, enabling
    chunked driving for max_time enforcement and verbose printing.

    In mixed-GEMM mode (Settings.phase2_gemm_dtype) the loop nests: chunks
    of ``anchor_every`` iterations, each followed by an exact cache
    reanchor — the amortized cost of exactness is 3 state-dtype GEMMs per
    chunk instead of per iteration."""
    op = as_operator(op)

    def cond(s: SolverState):
        return (s.status == _c.UNSOLVED) & (s.iter < iter_cap)

    def body(s: SolverState):
        return step(op, settings, s)

    mixed = (settings.phase2_gemm_dtype is not None
             and jnp.dtype(settings.phase2_gemm_dtype) != op.dtype
             and hasattr(op, "Amv_mixed"))
    incremental = s.kkt_cache is not None
    if not mixed and not incremental:
        return jax.lax.while_loop(cond, body, s)

    K = settings.anchor_every
    # mixed mode re-anchors the matvec caches too; incremental-only mode
    # rebuilds just the KKT cache (exact caches are already maintained)
    refresh = reanchor if mixed else rebuild_kkt_cache

    def chunk(s: SolverState):
        end = jnp.minimum(s.iter + K, iter_cap)
        s = jax.lax.while_loop(
            lambda t: (t.status == _c.UNSOLVED) & (t.iter < end), body, s)
        return refresh(op, settings, s)

    return jax.lax.while_loop(cond, chunk, s)


@_with_matmul_precision
def finalize(op, settings: Settings, s: SolverState,
             unsolved_status: int = _c.MAX_ITER_REACHED) -> Result:
    """Unscale the solution/certificates and assemble Info
    (store_solution, termination.c:82-92 + the exit path qpdo.c:451-473).
    ``unsolved_status`` is installed if the loop ended without latching
    (MAX_ITER_REACHED, or MAX_TIME_REACHED from the chunked driver)."""
    op = as_operator(op)
    status = jnp.where(s.status == _c.UNSOLVED,
                       unsolved_status, s.status).astype(jnp.int32)

    dt = op.dtype
    nan = jnp.asarray(jnp.nan, dt)
    cinv = op.cinv

    # unscale solution (store_solution, termination.c:82-92)
    x_out = tmap(jnp.multiply, op.D, s.x)
    y_out = tmap(lambda E, y: cinv * (E * y), op.E, s.y)
    # certificates (termination.c:143-146 and 206)
    dy_cert = tmap(lambda E, y, ybar: cinv * (E * (y - ybar)),
                   op.E, s.y, s.ybar)
    dx_cert = tmap(lambda D, x, xbar: D * (x - xbar), op.D, s.x, s.xbar)

    # NaN-filling per the MEX output contract (qpdo_mex.c:247-279)
    is_pinf = status == _c.PRIMAL_INFEASIBLE
    is_dinf = status == _c.DUAL_INFEASIBLE
    any_inf = is_pinf | is_dinf
    x_out = tmap(lambda v: jnp.where(any_inf, nan, v), x_out)
    y_out = tmap(lambda v: jnp.where(any_inf, nan, v), y_out)
    dy_cert = tmap(lambda v: jnp.where(is_pinf, v, nan), dy_cert)
    dx_cert = tmap(lambda v: jnp.where(is_dinf, v, nan), dx_cert)

    zero = jnp.asarray(0.0, dt)
    info = Info(
        iterations=s.iter, oterations=s.oter, status_val=status,
        res_prim_norm=s.res_prim_norm, res_dual_norm=s.res_dual_norm,
        res_prim_in_norm=s.res_prim_in_norm,
        res_dual_in_norm=s.res_dual_in_norm,
        objective=objective_value(op, s.x, s.Qx),
        setup_time=zero, solve_time=zero, run_time=zero,
        warmup_iterations=(s.warmup_iter if s.warmup_iter is not None
                           else jnp.zeros_like(s.iter)))
    return Result(x=x_out, y=y_out, prim_inf_cert=dy_cert,
                  dual_inf_cert=dx_cert, info=info)


@_with_matmul_precision
def polish_state(op, settings: Settings, s: SolverState) -> SolverState:
    """Attempt the solution polish (Settings.polish): one exact saddle
    solve on the active set identified from the current iterate, accepted
    per problem only when the recomputed outer residuals verify it.

    Dense-path only (operators without ``saddle_polish`` pass through).
    Acceptance: a still-running problem latches SOLVED when the polished
    residuals meet eps_abs; an already-SOLVED problem additionally requires
    a strict improvement of max(rp, rd) (the OSQP acceptance rule).
    Infeasibility latches are never touched."""
    op = as_operator(op)
    if not settings.polish or not hasattr(op, "saddle_polish"):
        return s
    dt = op.dtype
    eps_abs = jnp.asarray(settings.eps_abs, dt)
    cinv = op.cinv

    # activity in the mu -> 0 limit (newton.c:96-107): z = Ax + E^2 cinv y
    # strictly outside [l, u] on active rows (scaled space)
    z = s.Ax + (op.E * op.E * cinv) * s.y
    act_low = z < op.l
    act_up = z > op.u
    act = (act_low | act_up).astype(dt)
    bnd = jnp.where(act_low, op.l, jnp.where(act_up, op.u, 0.0))
    xp, yp = op.saddle_polish(act, bnd, settings)

    # verify: recomputed outer residuals of the polished pair (exact
    # state-dtype matvecs; the same formulas step() terminates on)
    Qxp = op.Qmv(xp)
    Axp = op.Amv(xp)
    Atyp = op.Atmv(yp)
    _, _, rp, rd = outer_residuals(op, yp, Qxp, Axp, Atyp)

    meets = (rp <= eps_abs) & (rd <= eps_abs)
    cur = jnp.maximum(s.res_prim_norm, s.res_dual_norm)
    running = s.status == _c.UNSOLVED
    solved = s.status == _c.SOLVED
    accept = meets & (running | (solved & (jnp.maximum(rp, rd) < cur)))

    pick = lambda new, old: tmap(
        lambda nv, ov: jnp.where(accept, nv, ov), new, old)
    # on acceptance the prox centers move to the polished point and the
    # inner norms are re-stamped with the (verified) outer norms, so every
    # Info field of a polished result belongs to the returned (x, y)
    return s._replace(
        x=pick(xp, s.x), y=pick(yp, s.y),
        Qx=pick(Qxp, s.Qx), Ax=pick(Axp, s.Ax), Aty=pick(Atyp, s.Aty),
        xbar=pick(xp, s.xbar), ybar=pick(yp, s.ybar),
        status=jnp.where(accept, _c.SOLVED, s.status).astype(jnp.int32),
        res_prim_norm=jnp.where(accept, rp, s.res_prim_norm),
        res_dual_norm=jnp.where(accept, rd, s.res_dual_norm),
        res_prim_in_norm=jnp.where(accept, rp, s.res_prim_in_norm),
        res_dual_in_norm=jnp.where(accept, rd, s.res_dual_in_norm))


def warmup_settings(settings: Settings) -> Settings:
    """Phase-1 settings of the hybrid solve: float32-safe tolerances.

    The reliable float32 residual floor is ~1e-3 (README "Precision
    model"), and the reference's aggressive per-row mu shrink (factor up to
    1/delta = 100 per outer iteration, iteration.c:136) must be floored at
    ``warmup_mu_min`` or cond(K) exceeds what a float32 Cholesky can carry.
    Infeasibility checks are deferred to the accurate phase (their
    eps-relative tests sit inside float32 noise)."""
    return settings.replace(
        eps_abs=settings.warmup_eps,
        mu_min=max(settings.mu_min, settings.warmup_mu_min),
        eps_prim_inf=0.0, eps_dual_inf=0.0,
        kkt_dtype=None, refine_steps=settings.warmup_refine_steps,
        hybrid_warmup=False,
        matmul_precision=settings.warmup_matmul_precision,
        stall_exit=settings.warmup_stall_exit)


def cast_scaled_problem(sp: ScaledProblem, to_dtype) -> ScaledProblem:
    from_dt = sp.data.Q.dtype
    return jax.tree.map(
        lambda a: a.astype(to_dtype) if a.dtype == from_dt else a, sp)


def warmup_iter_cap(settings: Settings) -> int:
    """Leave at least half the iteration budget to the accurate phase: an
    infeasible problem never reaches warmup_eps and would otherwise starve
    phase 2 of the iterations where detection happens."""
    return max(1, settings.max_iter // 2)


def _warmup_pass(op, settings: Settings,
                 x0, y0, warm_x: bool, warm_y: bool) -> SolverState:
    """Phase 1 of the hybrid solve: run the full algorithm in float32 to
    ``warmup_eps``, then upcast the state and recompute the caches exactly."""
    op = as_operator(op)
    s32_settings = warmup_settings(settings)
    f32 = jnp.float32
    op32 = op.cast(f32)
    x032 = None if x0 is None else tcast(x0, f32)
    y032 = None if y0 is None else tcast(y0, f32)
    s = init_state(op32, s32_settings, x032, y032, warm_x, warm_y)
    s = run_loop(op32, s32_settings, s, warmup_iter_cap(settings))
    return upcast_state(op, settings, s)


@_with_matmul_precision
def upcast_state(op, settings: Settings, s: SolverState) -> SolverState:
    """Upcast a phase-1 state: exact caches in the target dtype; phase-1
    "solved" is only solved to warmup_eps, so reset it (infeasibility /
    divergence latches are disabled in phase 1; NON_CVX is kept)."""
    op = as_operator(op)
    dt = op.dtype
    up = lambda a: tcast(a, dt)
    x, y = up(s.x), up(s.y)
    status = jnp.where((s.status == _c.SOLVED)
                       | (s.status == _c.WARMUP_STALLED),
                       _c.UNSOLVED, s.status)
    out = SolverState(
        x=x, y=y, Qx=op.Qmv(x), Ax=op.Amv(x), Aty=op.Atmv(y),
        dx_prev=up(s.dx_prev), xbar=up(s.xbar), ybar=up(s.ybar), mu=up(s.mu), sigma=up(s.sigma),
        eps_in=up(s.eps_in), res_prim_old=up(s.res_prim_old), tau=up(s.tau),
        iter=s.iter, iter_old=s.iter_old, oter=s.oter,
        status=status.astype(jnp.int32),
        res_prim_norm=up(s.res_prim_norm), res_dual_norm=up(s.res_dual_norm),
        res_prim_in_norm=up(s.res_prim_in_norm),
        res_dual_in_norm=up(s.res_dual_in_norm),
        warmup_iter=s.iter)  # phase boundary: everything so far was phase 1
    if s.kkt_cache is not None:
        # phase transition: rebuild the incremental-KKT cache in the
        # accurate phase's dtypes
        out = rebuild_kkt_cache(op, settings, out)
    return out


@_with_matmul_precision
def solve_scaled(op, settings: Settings,
                 x0, y0, warm_x: bool, warm_y: bool) -> Result:
    """Run the main loop on scaled data and unscale the outputs.

    Jit-safe; ``settings``/``warm_x``/``warm_y`` must be static."""
    op = as_operator(op)
    if settings.hybrid_warmup and op.dtype != jnp.float32:
        s0 = _warmup_pass(op, settings, x0, y0, warm_x, warm_y)
        # post-warmup polish: a verified polish from the warm point skips
        # the accurate phase entirely (the problem enters run_loop SOLVED)
        s0 = polish_state(op, settings, s0)
    else:
        s0 = init_state(op, settings, x0, y0, warm_x, warm_y)
        if warm_x and warm_y:
            # warm-start polish: an MPC re-solve whose active set is
            # unchanged finishes in ZERO iterations — one verified saddle
            # solve replaces the whole penalty schedule (no-op unless
            # settings.polish; rejected polishes fall through to the loop)
            s0 = polish_state(op, settings, s0)
    s = run_loop(op, settings, s0, settings.max_iter)
    # final polish: sharpen solved iterates / rescue unsolved ones
    s = polish_state(op, settings, s)
    return finalize(op, settings, s)
