"""Problem operators: one algorithm core over interchangeable linear algebra.

The reference hard-codes one data representation (CHOLMOD CSC sparse,
src/cholmod_interface.c) under one algorithm (src/iteration.c).  Here the
algorithm core (solver/core.py) is written against the small *operator*
protocol in this module, and each representation implements it:

- ``DenseOperator``         — dense Q/A, masked-matmul KKT + Cholesky
  (the batched small-QP fast path; replaces cholmod_interface.c:35-52).
- ``SparseOperator``        — sparse-triplet Q/A with preconditioned-CG Newton solves
  (the large-n path; plays the role of the reference's sparse LDL'
  factorization, cholmod_interface.c:8-52, without materializing K).
- ``BlockAngularOperator``  — scenario-structured arrow KKT with a
  distributed Schur complement (solver/structured.py; no reference
  equivalent — the reference is single-threaded).

Vector convention: *primal* vectors (x, Qx, Aty, rhs, q, D) and *dual*
vectors (y, Ax, mu, l, u, E) are pytrees.  For the dense and sparse
operators both are plain arrays; the block-angular operator carries the
primal side as an ``(x0, xs)`` tuple.  The tree helpers below make the
core's elementwise formulas representation-agnostic while compiling to
exactly the same XLA ops as the direct array code in the single-leaf case.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .types import ScaledProblem, Settings

# Static robustness-gate floors (Settings.robust_gate_auto): each banded
# fallback branch is compiled only when mu can reach the regime where its
# failure mode exists.  The CR Schur-cancellation class was measured at
# cond(K) ~ 1e7 (f32, mu ~ 1e-7; scripts/cr_traj_diag.py) — engage the
# scan fallback once mu_min can push cond past ~1e6.  The f32 factor
# mathematically cannot exist past cond ~ 1/eps32 (~1e7-1e8): the
# state-dtype escalation engages below mu_min = 1e-7, matching the dense
# kkt_pcg_refine auto rule and CLAUDE.md's "mu_min >= 1e-7 is the fast
# path" boundary.
_CR_FALLBACK_MU_FLOOR = 1e-6
_ESCALATE_MU_FLOOR = 1e-7


# ---------------------------------------------------------------------------
# Pytree vector helpers
# ---------------------------------------------------------------------------

def tmap(f, *trees):
    """Elementwise map over matching pytrees (scalars broadcast via closure)."""
    return jax.tree.map(f, *trees)


def tleaves(tree):
    return jax.tree.leaves(tree)


def tdot(a, b):
    """Sum of elementwise products over all leaves (inner product)."""
    parts = [jnp.dot(x.ravel(), y.ravel())
             for x, y in zip(tleaves(a), tleaves(b))]
    return functools.reduce(jnp.add, parts)


def tnorm_inf(a):
    """Infinity norm over all leaves."""
    parts = [jnp.max(jnp.abs(x)) for x in tleaves(a)]
    return functools.reduce(jnp.maximum, parts)


def tsum(a):
    """Scalar sum over all leaves."""
    parts = [jnp.sum(x) for x in tleaves(a)]
    return functools.reduce(jnp.add, parts)


def tany(a):
    """Logical-or reduction over all leaves of boolean trees."""
    parts = [jnp.any(x) for x in tleaves(a)]
    return functools.reduce(jnp.logical_or, parts)


def tflat(a):
    """Flatten a pytree vector into one 1-d array (linesearch assembly)."""
    leaves = [x.reshape(-1) for x in tleaves(a)]
    return leaves[0] if len(leaves) == 1 else jnp.concatenate(leaves)


def tcast(a, dtype):
    return tmap(lambda x: x.astype(dtype), a)


def tzeros_like(a, dtype=None):
    return tmap(lambda x: jnp.zeros_like(x, dtype=dtype), a)


def tfinite(a):
    """All leaves entirely finite (scalar bool)."""
    parts = [jnp.all(jnp.isfinite(x)) for x in tleaves(a)]
    return functools.reduce(jnp.logical_and, parts)


# ---------------------------------------------------------------------------
# Dense operator (the reference-parity fast path)
# ---------------------------------------------------------------------------

class DenseOperator(NamedTuple):
    """Dense Q/A with masked-matmul KKT formation + Cholesky Newton solves.

    Wraps a ``ScaledProblem``; primal and dual vectors are plain arrays.
    """

    sp: ScaledProblem

    # -- data accessors (scaled space) --
    @property
    def q(self):
        return self.sp.data.q

    @property
    def l(self):
        return self.sp.data.l

    @property
    def u(self):
        return self.sp.data.u

    @property
    def c(self):
        return self.sp.data.c

    @property
    def dtype(self):
        return self.sp.data.Q.dtype

    @property
    def D(self):
        return self.sp.scaling.D

    @property
    def Dinv(self):
        return self.sp.scaling.Dinv

    @property
    def E(self):
        return self.sp.scaling.E

    @property
    def Einv(self):
        return self.sp.scaling.Einv

    @property
    def cost(self):
        return self.sp.scaling.c

    @property
    def cinv(self):
        return self.sp.scaling.cinv

    @property
    def l_finite(self):
        return self.sp.l_finite

    @property
    def u_finite(self):
        return self.sp.u_finite

    # -- vectors --
    def zeros_primal(self):
        n = self.sp.data.Q.shape[-1]
        return jnp.zeros((n,), self.dtype)

    def zeros_dual(self):
        m = self.sp.data.A.shape[-2]
        return jnp.zeros((m,), self.dtype)

    # -- matvecs; ``dtype`` selects a reduced-precision compute path whose
    # result is cast back to the state dtype (see solver/core.py for where
    # the error analysis allows this) --
    def Qmv(self, x, dtype=None):
        Q = self.sp.data.Q
        if dtype is not None and jnp.dtype(dtype) != Q.dtype:
            return (Q.astype(dtype) @ x.astype(dtype)).astype(Q.dtype)
        return Q @ x

    def Amv(self, x, dtype=None):
        A = self.sp.data.A
        if dtype is not None and jnp.dtype(dtype) != A.dtype:
            return (A.astype(dtype) @ x.astype(dtype)).astype(A.dtype)
        return A @ x

    def Atmv(self, y, dtype=None):
        A = self.sp.data.A
        if dtype is not None and jnp.dtype(dtype) != A.dtype:
            return (A.T.astype(dtype) @ y.astype(dtype)).astype(A.dtype)
        return A.T @ y

    # -- paired matvecs: on TPU each state-dtype GEMM dispatch is expensive
    # (emulated float64), so the Newton direction and the infeasibility
    # certificate direction ride one stacked 2-column GEMM --
    def Amv2(self, xa, xb):
        AV = self.sp.data.A @ jnp.stack([xa, xb], axis=-1)     # (m, 2)
        return AV[..., 0], AV[..., 1]

    def Atmv2(self, ya, yb):
        AtV = self.sp.data.A.T @ jnp.stack([ya, yb], axis=-1)  # (n, 2)
        return AtV[..., 0], AtV[..., 1]

    def Qmv2(self, xa, xb):
        QV = self.sp.data.Q @ jnp.stack([xa, xb], axis=-1)     # (n, 2)
        return QV[..., 0], QV[..., 1]

    def QAmv2(self, xa, xb):
        """(Q xa, Q xb, A xa, A xb) as ONE stacked GEMM [Q; A] @ [xa|xb].

        The Newton direction and the dual-infeasibility certificate need
        both Q- and A-images of the same input pair; the vertical concat
        is a pure function of loop invariants (XLA's while-loop LICM
        hoists it), so this trades 2 MXU dispatches for 1 at identical
        per-row reductions."""
        d = self.sp.data
        QA = jnp.concatenate([d.Q, d.A], axis=-2)          # (n+m, n)
        V = QA @ jnp.stack([xa, xb], axis=-1)              # (n+m, 2)
        n = d.Q.shape[-1]
        return V[..., :n, 0], V[..., :n, 1], V[..., n:, 0], V[..., n:, 1]

    # -- mixed-precision matvecs with exact "hard rows" --------------------
    # The dual step divides A dx by mu (newton.c:60-63): on rows with tiny
    # mu a float32 A dx error eps32*||dx|| amplifies to eps32*||dx||/mu —
    # fatal below mu ~ 1e-3 (docs/design-notes.md).  But mu starts at the
    # Birgin-Martinez floor 1e-3 (iteration.c:107-109) and only shrinks on
    # persistently-violated rows, measured at <= a few rows per problem in
    # phase 2.  So: compute the GEMM in reduced precision and overwrite
    # the k smallest-mu rows with an exact gathered (k, n) product.  All
    # other consumers of A dx / A'dy (caches, linesearch) tolerate f32
    # noise because their error is proportional to the remaining path
    # length, not 1/mu.
    def Amv_mixed(self, x, mu, k: int, dtype):
        A = self.sp.data.A
        k = min(k, A.shape[-2])
        fast = (A.astype(dtype) @ x.astype(dtype)).astype(A.dtype)
        _, idx = jax.lax.top_k(-mu, k)
        exact = jnp.take(A, idx, axis=0) @ x
        return fast.at[idx].set(exact)

    def Atmv_mixed(self, y, mu, k: int, dtype):
        A = self.sp.data.A
        k = min(k, A.shape[-2])
        _, idx = jax.lax.top_k(-mu, k)
        y_soft = y.at[idx].set(0.0)
        fast = (A.T.astype(dtype) @ y_soft.astype(dtype)).astype(A.dtype)
        return fast + jnp.take(A, idx, axis=0).T @ y[idx]

    # -- Newton system solve (the factorization event, newton.c:21-49).
    # ``ytilde``/``res_dual_in`` select the fused-rhs mode: the A'ytilde
    # matvec rides the formation GEMM as one extra column (op-count cut,
    # Settings.fused_newton_rhs; rhs is then ignored). --
    def newton_solve(self, active, mu, sigma, rhs, settings: Settings,
                     dx_prev=None, tol_hint=None,
                     ytilde=None, res_dual_in=None):
        from .ops.linalg import newton_system_solve
        d = self.sp.data
        if settings.kkt_solver == "cg":
            return self._newton_solve_cg(active, mu, sigma, rhs, settings,
                                         dx_prev, tol_hint,
                                         ytilde, res_dual_in)
        pcg_iters = settings.kkt_pcg_refine
        if pcg_iters < 0:  # AUTO: only the f32-factor/tiny-mu regime pays
            reduced = (settings.kkt_dtype is not None
                       and jnp.dtype(settings.kkt_dtype) != self.dtype)
            pcg_iters = 32 if (reduced and settings.mu_min < 1e-7) else 0
        return newton_system_solve(d.Q, d.A, active, mu, sigma, rhs,
                                   settings.proximal, settings.refine_steps,
                                   settings.kkt_dtype,
                                   settings.pallas_formation,
                                   ytilde, res_dual_in,
                                   pcg_refine=pcg_iters,
                                   pallas_kkt=settings.pallas_kkt,
                                   escalate_rtol=getattr(
                                       settings, "kkt_escalate_rtol", 0.0))

    # -- Incremental KKT formation (Settings.kkt_update_rows > 0): the
    # TPU analogue of the reference's rank-k factor updates
    # (cholmod_interface.c:57-93) — see ops/linalg.py.
    def kkt_cache_init(self, active, mu, settings: Settings, sigma=None):
        d = self.sp.data
        if sigma is None:
            sigma = jnp.asarray(settings.sigma_init, self.dtype)
        if settings.kkt_solver in ("inv", "ns"):
            # anchored explicit inverse (refreshed by run_loop's nested
            # loop every anchor_every iterations); sigma drifts between
            # anchors but X is only a preconditioner — exactness comes
            # from CG over the CURRENT K each Newton step
            from .ops.linalg import kkt_inverse
            return kkt_inverse(d.Q, d.A, active, mu, sigma,
                               settings.proximal, settings.kkt_dtype)
        from .ops.linalg import kkt_cache_build
        return kkt_cache_build(d.Q, d.A, active / mu, settings.kkt_dtype)

    def newton_solve_cached(self, active, mu, sigma, rhs,
                            settings: Settings, cache, dx_prev=None,
                            tol_hint=None):
        if settings.kkt_solver == "ns":
            return self._newton_solve_ns(active, mu, sigma, rhs,
                                         settings, cache)
        if settings.kkt_solver == "inv":
            return self._newton_solve_inv(active, mu, sigma, rhs,
                                          settings, cache, dx_prev,
                                          tol_hint)
        from .ops.linalg import newton_system_solve_cached
        d = self.sp.data
        return newton_system_solve_cached(
            d.Q, d.A, active / mu, sigma, rhs, cache, settings.proximal,
            settings.refine_steps, settings.kkt_dtype,
            settings.kkt_update_rows)

    def _newton_solve_ns(self, active, mu, sigma, rhs, settings: Settings,
                         X):
        """Newton-Schulz-TRACKED inverse (Settings.kkt_solver="ns"): a
        fixed count of LARGE MXU ops per Newton step, no inner loop.

        Round-5 probe verdict: on this chip per-kernel launch latency
        (~20-40 us) times the number of sequential small ops is the real
        cost model — a while-loop PCG pays ~0.3-0.5 ms PER CG ITERATION
        in predicate/reduction/GEMV dribble, while the pure-GEMM
        candidate iteration (formation + 2 NS steps + apply) runs at
        1.7 ms (B=256) / 6.7 TFLOPS (B=1024).  So the direction solve is
        restructured as O(1) big ops:

          1. K = formation GEMM (current, exact w);
          2. safeguarded damping: bound lam ~ ||KX||_2 via
             sqrt(||KX||_1 ||KX||_inf) and rescale X <- cX with
             c = min(1, 1.9/lam) — Newton-Schulz contracts iff
             eigs(KX) in (0,2), and a mu shrink (factor 10-100 at outer
             updates) would otherwise push the spectral radius of
             (I - KX) to ~9 and square it into NaN;
          3. kkt_ns_steps Newton-Schulz updates X <- X(2I - KX)
             (2 GEMMs each, error SQUARES per step while contracting);
          4. dx = X rhs + one monotone-guarded Richardson correction
             (3 GEMVs + 2 norms);
          5. resymmetrize X (NS preserves symmetry only in exact
             arithmetic).

        The anchored exact rebuild (run_loop's nested refresh ->
        kkt_cache_init -> ops/linalg.kkt_inverse) bounds drift every
        anchor_every iterations exactly like the reference's periodic
        refactorization (newton.c:21-24): a damped post-shrink X recovers
        quadratically over the next few steps or is replaced at the next
        anchor, whichever comes first.  Returns (dx, X_new)."""
        from .ops.linalg import form_kkt

        d = self.sp.data
        dt = self.dtype
        kdt = jnp.dtype(settings.kkt_dtype) if settings.kkt_dtype else dt
        proximal = settings.proximal
        K = form_kkt(d.Q.astype(kdt), d.A.astype(kdt), active.astype(kdt),
                     mu.astype(kdt), jnp.asarray(sigma, kdt), proximal)
        n = K.shape[-1]
        eye = jnp.eye(n, dtype=kdt)
        ns_steps = max(1, settings.kkt_ns_steps)

        KX = K @ X
        # spectral-radius safeguard: lam >= ||KX||_2
        lam = jnp.sqrt(jnp.max(jnp.sum(jnp.abs(KX), axis=-1))
                       * jnp.max(jnp.sum(jnp.abs(KX), axis=-2)))
        c = jnp.minimum(jnp.asarray(1.0, kdt),
                        jnp.asarray(1.9, kdt) / jnp.maximum(lam, 1e-30))
        X = c * X
        KX = c * KX
        for i in range(ns_steps):
            if i > 0:
                KX = K @ X
            X = X @ (2.0 * eye - KX)
        X = 0.5 * (X + jnp.swapaxes(X, -1, -2))

        rhs_k = rhs.astype(kdt)
        dx0 = X @ rhs_k
        r0 = rhs_k - K @ dx0
        dx1 = dx0 + X @ r0
        r1 = rhs_k - K @ dx1
        better = jnp.linalg.norm(r1) < jnp.linalg.norm(r0)
        dx = jnp.where(better, dx1, dx0).astype(dt)
        if kdt != dt:
            # one state-dtype correction (the kkt_dtype contract)
            w = active / mu

            def Kmv(v):
                Kv = d.Q @ v + d.A.T @ (w * (d.A @ v))
                if proximal:
                    Kv = Kv + sigma * v
                return Kv

            r = rhs - Kmv(dx)
            dx_new = dx + (X @ r.astype(kdt)).astype(dt)
            better2 = (jnp.linalg.norm(rhs - Kmv(dx_new))
                       < jnp.linalg.norm(r))
            dx = jnp.where(better2, dx_new, dx)
        # a diverged X must not poison the cache: fall back to a Jacobi
        # guess (recovered exactly at the next anchor rebuild)
        x_ok = jnp.all(jnp.isfinite(X))
        dK = jnp.diagonal(K, axis1=-2, axis2=-1)
        jac = jnp.zeros_like(X) + (jnp.where(dK > 0, 1.0 / jnp.where(
            dK > 0, dK, 1.0), 1.0)[..., :, None] * eye)
        X = jnp.where(x_ok, X, jac)
        finite = jnp.all(jnp.isfinite(dx))
        return jnp.where(finite, dx, jnp.zeros_like(dx)), X

    def _newton_solve_inv(self, active, mu, sigma, rhs, settings: Settings,
                          X, dx_prev=None, tol_hint=None):
        """Anchored-inverse Newton solve (Settings.kkt_solver="inv").

        Per Newton step: form the CURRENT K (one MXU GEMM) and run a
        FIXED number of CG iterations preconditioned by the anchored
        explicit inverse X ~= K_anchor^{-1} (one GEMM-apply per CG
        iteration, no triangular solves anywhere in the loop).  Between
        anchors K drifts only through mu shrinks / sigma updates /
        active-set flips, so the preconditioned spectrum stays tightly
        clustered and a handful of iterations recovers the direction;
        the anchor refresh (run_loop nested loop -> rebuild_kkt_cache)
        bounds staleness exactly like the reference's periodic full
        refactorization (newton.c:21-24, RESET_NEWTON_ITER).

        Replaces the lax.linalg batched Cholesky+trisolve path that the
        round-5 probes measured at 0.02 TFLOPS (~5 of the 5.3 ms bench
        iteration) with pure GEMM/matvec work.  Returns (dx, X)."""
        from .ops.cg import cg_fixed, pcg
        from .ops.linalg import form_kkt

        d = self.sp.data
        dt = self.dtype
        kdt = jnp.dtype(settings.kkt_dtype) if settings.kkt_dtype else dt
        w = active / mu
        proximal = settings.proximal
        K = form_kkt(d.Q.astype(kdt), d.A.astype(kdt), active.astype(kdt),
                     mu.astype(kdt), jnp.asarray(sigma, kdt), proximal)
        iters = settings.kkt_cg_fixed

        def precond(r):
            return X @ r

        if kdt == dt:
            if iters <= 0:
                # adaptive: early-exit PCG under the same Eisenstat-
                # Walker forcing rule as the sparse CG path (directions
                # only need a fraction of the current inner tolerance).
                # With the anchored-inverse preconditioner the spectrum
                # clusters at 1 and typical counts are single-digit, so
                # the while_loop's per-iteration predicate cost stays
                # bounded (unlike the Jacobi-CG mode it replaces, which
                # ran 50-400 predicate-bearing iterations)
                tol = 1e-9 if dt == jnp.dtype(jnp.float64) else 1e-5
                if tol_hint is not None:
                    rhs_norm = jnp.maximum(jnp.linalg.norm(rhs), 1e-30)
                    tol = jnp.clip(0.05 * tol_hint / rhs_norm, tol, 1e-2)
                # cap at 4n like the plain-CG mode: a 64-iteration cap
                # binds on the f32 high-cond steps and inflates OUTER
                # iterations 90 vs 57 (measured, bench batch)
                dx, _, _ = pcg(lambda v: K @ v, rhs, precond, tol,
                               min(settings.cg_max_iter, 4 * K.shape[-1]),
                               x0=dx_prev)
            else:
                dx = cg_fixed(lambda v: K @ v, rhs, precond, iters,
                              x0=dx_prev)
        else:
            # reduced-precision CG + state-dtype monotone refinement
            # (the kkt_dtype contract of the direct path)
            iters_eff = iters if iters > 0 else 8

            def solve_lo(b, x0=None):
                bk = b.astype(kdt)
                return cg_fixed(lambda v: K @ v, bk, precond, iters_eff,
                                x0=x0).astype(dt)

            def Kmv(v):
                Kv = d.Q @ v + d.A.T @ (w * (d.A @ v))
                if proximal:
                    Kv = Kv + sigma * v
                return Kv

            dx = solve_lo(rhs, None if dx_prev is None
                          else dx_prev.astype(kdt))
            r = rhs - Kmv(dx)
            rn = jnp.linalg.norm(r)
            for _ in range(settings.refine_steps):
                dx_new = dx + solve_lo(r)
                r_new = rhs - Kmv(dx_new)
                rn_new = jnp.linalg.norm(r_new)
                better = rn_new < rn
                dx = jnp.where(better, dx_new, dx)
                r = jnp.where(better, r_new, r)
                rn = jnp.where(better, rn_new, rn)
        finite = jnp.all(jnp.isfinite(dx))
        return jnp.where(finite, dx, jnp.zeros_like(dx)), X

    def _newton_solve_cg(self, active, mu, sigma, rhs, settings: Settings,
                         dx_prev=None, tol_hint=None,
                         ytilde=None, res_dual_in=None):
        """Factorization-FREE dense Newton solve (Settings.kkt_solver="cg").

        The round-5 shape probes showed the batched Cholesky+trisolve
        path is the bench bottleneck: lax.linalg lowers to ~n sequential
        steps of tiny ops and sustains 0.02 TFLOPS at (B=256, n=100)
        while the formation GEMM sustains 0.5-2.9 — the factorization is
        ~5 of the 5.3 ms iteration.  This mode forms K once per Newton
        iteration (one MXU GEMM, the cheap part) and solves K dx = rhs
        by Jacobi-preconditioned CG with materialized-K matvecs (one
        (B,n,n)@(B,n) memory-bound matvec per CG iteration), warm-started
        from the previous direction and driven by the Eisenstat-Walker
        forcing term of tol_hint — early subproblems take a handful of
        CG iterations.  The reference's exact-factorization semantics
        are recovered in the state dtype by the caller's refinement
        machinery; directions are INEXACT by construction, so
        newton_exact() reports False and the full-step acceptance stays
        off (same contract as SparseOperator)."""
        from .ops.cg import pcg, pcg_refined
        from .ops.linalg import form_kkt

        d = self.sp.data
        dt = self.dtype
        kdt = jnp.dtype(settings.kkt_dtype) if settings.kkt_dtype else dt
        w = active / mu
        proximal = settings.proximal
        if ytilde is not None:  # fused-rhs mode: no GEMM to ride here
            rhs = -(res_dual_in
                    + (d.A.T.astype(kdt) @ ytilde.astype(kdt)).astype(dt))

        K = form_kkt(d.Q.astype(kdt), d.A.astype(kdt), active.astype(kdt),
                     mu.astype(kdt), jnp.asarray(sigma, kdt), proximal)
        diag = jnp.diagonal(K, axis1=-2, axis2=-1)
        dinv = jnp.where(diag > 0,
                         1.0 / jnp.where(diag > 0, diag, 1.0), 1.0)

        tol = settings.cg_tol if dt == jnp.dtype(jnp.float64) else 1e-5
        if tol_hint is not None:
            rhs_norm = jnp.maximum(jnp.linalg.norm(rhs), 1e-30)
            tol = jnp.clip(0.05 * tol_hint / rhs_norm, tol, 1e-2)
        iters = min(settings.cg_max_iter, 4 * K.shape[-1])

        if kdt == dt and settings.kkt_cg_fixed > 0:
            # fixed-trip-count CG (no convergence predicate): the
            # while_loop variant's per-iteration test dominates at
            # batched small shapes on TPU (measured 4.2x slower than
            # the factorization it replaced) — see ops/cg.cg_fixed
            from .ops.cg import cg_fixed
            dx = cg_fixed(lambda v: K @ v, rhs, dinv,
                          settings.kkt_cg_fixed, x0=dx_prev)
            finite = jnp.all(jnp.isfinite(dx))
            return jnp.where(finite, dx, jnp.zeros_like(dx))

        if kdt != dt:
            # reduced-precision CG inside state-dtype refinement rounds:
            # the K matvec and preconditioner run in kdt, the outer
            # residual in the state dtype (mirrors the sparse cg_dtype
            # path)
            def Kmv_hi(v):
                Kv = d.Q @ v + d.A.T @ (w * (d.A @ v))
                if proximal:
                    Kv = Kv + sigma * v
                return Kv

            def Kmv_lo(v):
                return K @ v

            dx, _, _ = pcg_refined(
                Kmv_hi, Kmv_lo, rhs, dinv, tol, iters,
                settings.cg_refine_rounds, kdt,
                x0=dx_prev)
        else:
            dx, _, _ = pcg(lambda v: K @ v, rhs, dinv, tol, iters,
                           x0=dx_prev)
        finite = jnp.all(jnp.isfinite(dx))
        return jnp.where(finite, dx, jnp.zeros_like(dx))

    def newton_exact(self, settings: Settings) -> bool:
        """Directions are exact-direct except in incremental-KKT mode,
        where a stale K-tilde + fixed PCG budget can leave them inexact —
        the full-step acceptance (Settings.newton_full_step) must not
        trust those (same reasoning as SparseOperator.newton_exact).
        The factorization-free CG mode (kkt_solver="cg") is inexact by
        construction.  The anchored-inverse mode ("inv") reports True:
        its adaptive PCG drives the direction to a fixed relative
        target, and the full-step acceptance is a MEASURED test (the
        trial inner residual is computed exactly from the cache
        increments of the actual dx) — a poor direction simply fails
        the gamma-shrink test and falls back to the linesearch step, so
        soundness does not rest on exactness (verified: CPU bench-batch
        iteration parity with the direct path)."""
        return (settings.kkt_update_rows == 0
                and settings.kkt_solver in ("chol", "inv", "ns"))

    def saddle_polish(self, act, bnd, settings: Settings):
        """Equality-KKT polish solve on the identified active set
        (Settings.polish; ops/linalg.saddle_polish_solve)."""
        from .ops.linalg import saddle_polish_solve
        d = self.sp.data
        return saddle_polish_solve(d.Q, d.A, d.q, act, bnd,
                                   settings.polish_delta,
                                   settings.polish_refine,
                                   settings.kkt_dtype)

    def cast(self, dtype) -> "DenseOperator":
        from_dt = self.dtype
        sp = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == from_dt else a, self.sp)
        return DenseOperator(sp=sp)


# ---------------------------------------------------------------------------
# Hand-rolled small-block Cholesky / substitutions (no lax.linalg)
#
# The axon TPU's float64 emulation carries elementwise mul/add/sqrt/div
# but a float64 ``jnp.linalg.cholesky`` crashes the device (CLAUDE.md).
# These unrolled variants — the block size b is static, so Python loops
# over b lower to a flat op graph — let the banded escalation path
# factor in the STATE dtype on any backend, matching the robustness of
# the reference's f64 LDL' (cholmod_interface.c:8-30) at its
# mu_min=1e-9 default where a float32 factor mathematically cannot
# exist (measured: the equilibrated LISWET KKT at w=1e9 has spectral
# cond ~1e9 > 1/eps32; jnp.linalg.cholesky returns NaN and the solver's
# NaN-guard zero direction turns the dual update dy = w*(A dx) - ytilde
# into a +rp/mu staircase — logs/liswet5625_isolate_mu1e9.log).
# ---------------------------------------------------------------------------

def _chol_unrolled(D):
    """Cholesky of (..., b, b) SPD blocks, column-by-column
    (Cholesky–Banachiewicz) unrolled over the static block size."""
    b = D.shape[-1]
    L = jnp.zeros_like(D)
    idx = jnp.arange(b)
    for j in range(b):
        v = D[..., :, j]
        if j:
            # v_i -= sum_k<j L[i,k] L[j,k]
            v = v - jnp.sum(L[..., :, :j] * L[..., j:j + 1, :j], axis=-1)
        ljj = jnp.sqrt(v[..., j:j + 1])
        col = v / ljj
        L = L.at[..., :, j].set(jnp.where(idx >= j, col, 0.0))
    return L


def _tri_solve_unrolled(L, r, trans=False):
    """Solve L x = r (``trans=False``) or L' x = r (``trans=True``) for
    (..., b, b) lower-triangular L and (..., b) r, by substitution
    unrolled over the static b."""
    b = L.shape[-1]
    xs = [None] * b
    order = range(b) if not trans else reversed(range(b))
    for i in order:
        acc = r[..., i]
        if not trans:
            if i:
                acc = acc - jnp.sum(
                    L[..., i, :i] * jnp.stack(xs[:i], axis=-1), axis=-1)
        else:
            if i < b - 1:
                acc = acc - jnp.sum(
                    L[..., i + 1:, i] * jnp.stack(xs[i + 1:], axis=-1),
                    axis=-1)
        xs[i] = acc / L[..., i, i]
    return jnp.stack(xs, axis=-1)


def _tri_solve_unrolled_mat(L, B):
    """Solve L X = B for (..., b, b) lower-triangular L and (..., b, m)
    B (forward substitution on each column, unrolled over b)."""
    b = L.shape[-1]
    xs = [None] * b
    for i in range(b):
        acc = B[..., i, :]
        if i:
            acc = acc - jnp.sum(
                L[..., i, :i, None] * jnp.stack(xs[:i], axis=-2), axis=-2)
        xs[i] = acc / L[..., i, i, None]
    return jnp.stack(xs, axis=-2)


# ---------------------------------------------------------------------------
# Sparse operator (the large-n path)
# ---------------------------------------------------------------------------

class SparseOperator(NamedTuple):
    """Sparse-triplet Q/A with matrix-free preconditioned-CG Newton solves.

    The large-n replacement of the reference's sparse LDL' backend
    (src/cholmod_interface.c:8-52): K = Q + sigma*I + A' diag(active/mu) A
    is never materialized — Newton directions come from Jacobi- or
    block-Jacobi-preconditioned CG (ops/cg.py) whose matvec is three
    O(nnz) scatter products.  Scaled-space data, like ``DenseOperator``;
    build via ``qpdo_tpu.solver.sparse.setup_sparse``.

    Storage is raw COO triplets (plain arrays, so the operator is an
    ordinary pytree: ``vmap`` over same-pattern instances maps the float
    leaves and broadcasts the index leaves); both matvec directions use
    the same row-sorted index array.  ``diagQ`` is precomputed once.
    """

    q_data: jax.Array   # (nseQ,) values of full symmetric Q
    q_idx: jax.Array    # (nseQ, 2) int32 [row, col]
    a_data: jax.Array   # (nseA,)
    a_idx: jax.Array    # (nseA, 2) int32 [row, col]
    diagQ: jax.Array    # (n,)
    q: jax.Array        # (n,)
    l: jax.Array        # (m,)
    u: jax.Array        # (m,)
    c: jax.Array        # scalar
    D: jax.Array
    Dinv: jax.Array
    E: jax.Array
    Einv: jax.Array
    cost: jax.Array
    cinv: jax.Array
    l_finite: jax.Array
    u_finite: jax.Array
    # Optional block-Jacobi preconditioner index maps, precomputed from the
    # sparsity pattern at setup (None -> plain Jacobi):
    #   pjA = (t1, t2, rows, blk, o1, o2): same-row same-block nonzero
    #         pairs of A -> w-weighted outer-product contributions
    #   pjQ = (t, blk, o1, o2): Q entries inside diagonal blocks
    pjA: Any = None
    pjQ: Any = None
    # Optional coarse-grid correction maps (two-level preconditioner):
    #   pcA = (t1, t2, rows, J1, J2): same-row nonzero pairs -> coarse
    #         cells of P'(A'WA)P;  pcQ = (J1, J2): Q entries -> coarse
    #         cells;  pc_counts = aggregate sizes (for the sigma term)
    pcA: Any = None
    pcQ: Any = None
    pc_counts: Any = None
    # Optional block-tridiagonal direct-solve maps, precomputed when the
    # KKT pattern is banded (solver/sparse.py:_banded_indices):
    #   bdA    = (t1, t2, rows, blk, o1, o2): same-row A-pairs -> diagonal
    #            blocks D_k of K;  bdAsub: pairs one block apart -> the
    #            sub-diagonal blocks E_k = K[k+1, k]
    #   bdQ/bdQsub: Q entries -> diagonal / sub-diagonal blocks
    #   bd_tmpl = int32 (nb, b) zeros (static block geometry carrier)
    bdA: Any = None
    bdAsub: Any = None
    bdQ: Any = None
    bdQsub: Any = None
    bd_tmpl: Any = None
    # Optional ELL (padded-row gather) matvec maps, one per direction
    # (solver/sparse.py:_ell_maps): (gather, idx, mask) int32/int32/int8
    # of shape (out_dim, K).  When present, Qmv/Amv/Atmv run as gather +
    # dense row-sum — no scatter in the CG hot loop (the TPU fast path);
    # None on irregular patterns (scatter fallback).
    ellQ: Any = None
    ellA: Any = None
    ellAt: Any = None

    @property
    def dtype(self):
        return self.q.dtype

    @property
    def n(self):
        return self.q.shape[-1]

    @property
    def m(self):
        return self.l.shape[-1]

    def zeros_primal(self):
        return jnp.zeros((self.n,), self.dtype)

    def zeros_dual(self):
        return jnp.zeros((self.m,), self.dtype)

    def _scatter_mv(self, data, rows, cols, x, out_dim, dtype):
        if dtype is not None and jnp.dtype(dtype) != self.dtype:
            out = jnp.zeros((out_dim,), dtype).at[rows].add(
                data.astype(dtype) * x[cols].astype(dtype))
            return out.astype(self.dtype)
        return jnp.zeros((out_dim,), self.dtype).at[rows].add(data * x[cols])

    def _ell_mv(self, data, ell, x, dtype):
        """out[i] = sum_k data[g[i,k]] * x[idx[i,k]] * mask[i,k] — gather
        + dense row-sum, no scatter (the TPU fast path)."""
        g, idx, mask = ell
        cd = jnp.dtype(dtype) if dtype is not None else self.dtype
        vals = data[g].astype(cd) * mask.astype(cd)
        out = (vals * x[idx].astype(cd)).sum(axis=-1)
        return out.astype(self.dtype)

    def Qmv(self, x, dtype=None):
        if self.ellQ is not None:
            return self._ell_mv(self.q_data, self.ellQ, x, dtype)
        return self._scatter_mv(self.q_data, self.q_idx[:, 0],
                                self.q_idx[:, 1], x, self.n, dtype)

    def Amv(self, x, dtype=None):
        if self.ellA is not None:
            return self._ell_mv(self.a_data, self.ellA, x, dtype)
        return self._scatter_mv(self.a_data, self.a_idx[:, 0],
                                self.a_idx[:, 1], x, self.m, dtype)

    def Atmv(self, y, dtype=None):
        # A' y re-uses the same triplets with roles swapped
        if self.ellAt is not None:
            return self._ell_mv(self.a_data, self.ellAt, y, dtype)
        return self._scatter_mv(self.a_data, self.a_idx[:, 1],
                                self.a_idx[:, 0], y, self.n, dtype)

    def _ell_mv2(self, data, ell, X):
        g, idx, mask = ell
        vals = data[g] * mask.astype(self.dtype)         # (out, K)
        return (vals[..., None] * X[idx, :]).sum(axis=-2)  # (out, 2)

    def Amv2(self, xa, xb):
        X = jnp.stack([xa, xb], axis=-1)               # (n, 2)
        if self.ellA is not None:
            AV = self._ell_mv2(self.a_data, self.ellA, X)
            return AV[..., 0], AV[..., 1]
        rows, cols = self.a_idx[:, 0], self.a_idx[:, 1]
        AV = jnp.zeros((self.m, 2), self.dtype).at[rows].add(
            self.a_data[:, None] * X[cols, :])
        return AV[..., 0], AV[..., 1]

    def Atmv2(self, ya, yb):
        Y = jnp.stack([ya, yb], axis=-1)               # (m, 2)
        if self.ellAt is not None:
            AtV = self._ell_mv2(self.a_data, self.ellAt, Y)
            return AtV[..., 0], AtV[..., 1]
        rows, cols = self.a_idx[:, 0], self.a_idx[:, 1]
        AtV = jnp.zeros((self.n, 2), self.dtype).at[cols].add(
            self.a_data[:, None] * Y[rows, :])
        return AtV[..., 0], AtV[..., 1]

    def Qmv2(self, xa, xb):
        X = jnp.stack([xa, xb], axis=-1)               # (n, 2)
        if self.ellQ is not None:
            QV = self._ell_mv2(self.q_data, self.ellQ, X)
            return QV[..., 0], QV[..., 1]
        rows, cols = self.q_idx[:, 0], self.q_idx[:, 1]
        QV = jnp.zeros((self.n, 2), self.dtype).at[rows].add(
            self.q_data[:, None] * X[cols, :])
        return QV[..., 0], QV[..., 1]

    def diag_K(self, active, mu, sigma, proximal: bool):
        """diag(K) in O(nnz) without forming K: diag(Q) + sigma +
        sum_i (active_i/mu_i) * A_{ij}^2 per column j."""
        w = active / mu
        if self.ellAt is not None:
            # column-grouped gather form (no scatter): the ellAt map's
            # idx entries are the row of each A entry in column j
            g, ridx, mask = self.ellAt
            vals = self.a_data[g] * mask.astype(self.dtype)
            d = (w[ridx] * jnp.square(vals)).sum(axis=-1)
        else:
            rows, cols = self.a_idx[:, 0], self.a_idx[:, 1]
            d = jnp.zeros_like(self.diagQ).at[cols].add(
                w[rows] * jnp.square(self.a_data))
        d = d + self.diagQ
        if proximal:
            d = d + sigma
        return d

    def _block_jacobi_apply(self, w, sigma, dinv_jacobi, settings: Settings):
        """Build the block-diagonal of K matrix-free and return the
        preconditioner apply r -> M^{-1} r.

        The block diagonal is assembled by scatter-adds over precomputed
        same-row/same-block nonzero pairs (pjA) plus Q's in-block entries
        (pjQ), then factored with one *batched* dense Cholesky — the
        TPU-native answer to incomplete factorizations, which are
        inherently sequential.  Blocks whose Cholesky fails (numerically
        semidefinite) fall back to Jacobi rows."""
        b = settings.precond_block
        n = self.n
        nb = -(-n // b)
        dt = self.dtype
        t1, t2, rows_p, blk, o1, o2 = self.pjA
        vals = self.a_data[t1] * self.a_data[t2] * w[rows_p]
        B = jnp.zeros((nb, b, b), dt).at[blk, o1, o2].add(vals)
        tq, qblk, qo1, qo2 = self.pjQ
        B = B.at[qblk, qo1, qo2].add(self.q_data[tq])
        idx = jnp.arange(b)
        diag = B[:, idx, idx]
        shift = sigma if settings.proximal else jnp.asarray(0.0, dt)
        # lift exactly-zero diagonals (padded tail / untouched variables)
        bump = jnp.where(diag + shift > 0, shift, shift + 1.0)
        B = B.at[:, idx, idx].add(bump)
        # factor in precond_dtype: the preconditioner only steers CG, so a
        # float32 factorization changes iteration counts, not answers —
        # and keeps the batched Cholesky off TPU emulated-float64
        pdt = (jnp.dtype(settings.precond_dtype) if settings.precond_dtype
               else dt)
        chol = jnp.linalg.cholesky(B.astype(pdt))
        ok = jnp.all(jnp.isfinite(chol), axis=(-2, -1))        # (nb,)
        pad = nb * b - n
        dj = jnp.concatenate([dinv_jacobi, jnp.ones((pad,), dt)]) \
            if pad else dinv_jacobi

        coarse = None
        if settings.precond_two_level and self.pcA is not None:
            coarse = self._coarse_apply(w, sigma, settings)

        def apply(r):
            rp = jnp.concatenate([r, jnp.zeros((pad,), dt)]) if pad else r
            rb = rp.reshape(nb, b, 1)
            rbk = rb.astype(pdt)
            z = jax.scipy.linalg.solve_triangular(chol, rbk, lower=True)
            z = jax.scipy.linalg.solve_triangular(chol, z, lower=True,
                                                  trans=1)[..., 0].astype(dt)
            zj = dj.reshape(nb, b) * rb[..., 0]
            z = jnp.where(ok[:, None], z, zj)
            z = z.reshape(-1)[:n] if pad else z.reshape(-1)
            if coarse is not None:
                z = z + coarse(r)
            return z

        return apply

    def _coarse_apply(self, w, sigma, settings: Settings):
        """Two-level additive coarse correction r -> P Kc^{-1} P' r with
        P = piecewise-constant aggregation of ``precond_block`` columns.

        Block-Jacobi removes coupling *inside* blocks; the coarse solve
        removes the low-frequency modes spanning blocks — the modes that
        make CG iteration counts grow with n on PDE/banded KKT systems
        (LISWET/AUG-style).  Kc = P'KP is assembled matrix-free in O(nnz)
        from setup-precomputed scatter maps and dense-factored at size
        nc = ceil(n / block)."""
        dt = self.dtype
        n = self.n
        b = settings.precond_block
        nc = self.pc_counts.shape[0]
        t1, t2, rows_p, J1, J2 = self.pcA
        vals = self.a_data[t1] * self.a_data[t2] * w[rows_p]
        Kc = jnp.zeros((nc, nc), dt).at[J1, J2].add(vals)
        qJ1, qJ2 = self.pcQ
        Kc = Kc.at[qJ1, qJ2].add(self.q_data)
        counts = self.pc_counts.astype(dt)
        diag_idx = jnp.arange(nc)
        shift = sigma if settings.proximal else jnp.asarray(0.0, dt)
        Kc = Kc.at[diag_idx, diag_idx].add(shift * counts)
        # relative regularization keeps a semidefinite coarse matrix
        # factorizable; NaN factor disables the correction entirely
        tr = jnp.sum(jnp.abs(jnp.diagonal(Kc))) / nc
        Kc = Kc.at[diag_idx, diag_idx].add(1e-10 * tr + 1e-30)
        pdt = (jnp.dtype(settings.precond_dtype) if settings.precond_dtype
               else dt)
        cholc = jnp.linalg.cholesky(Kc.astype(pdt))
        ok = jnp.all(jnp.isfinite(cholc))
        cgrid = jnp.arange(n) // b

        def coarse(r):
            rc = jnp.zeros((nc,), dt).at[cgrid].add(r).astype(pdt)
            z = jax.scipy.linalg.solve_triangular(cholc, rc, lower=True)
            z = jax.scipy.linalg.solve_triangular(cholc, z, lower=True,
                                                  trans=1).astype(dt)
            z = jnp.where(ok, z, 0.0)
            return z[cgrid]

        return coarse

    def newton_exact(self, settings: Settings) -> bool:
        """Whether newton_solve returns exact (direct-factorization)
        directions under these settings.  The full-step acceptance
        (Settings.newton_full_step) is only sound for exact directions:
        an inexact CG direction can shrink the inner residual while the
        merit explodes, and the residual-only gate would accept it."""
        return self.bd_tmpl is not None and settings.newton_direct

    def _assemble_banded(self, w, sigma, settings: Settings):
        """Assemble the block-tridiagonal form of K = Q + sigma*I + A'WA
        by scatter-adds over the precomputed banded maps (O(nnz)).
        Returns (D, E) in the factorization dtype: D = (nb, b, b) diagonal
        blocks, E = (nb-1, b, b) sub-diagonal blocks E_k = K[k+1, k]."""
        dt = self.dtype
        nb, b = self.bd_tmpl.shape

        t1, t2, rows_p, blk, o1, o2 = self.bdA
        vals = self.a_data[t1] * self.a_data[t2] * w[rows_p]
        D = jnp.zeros((nb, b, b), dt).at[blk, o1, o2].add(vals)
        tq, qblk, qo1, qo2 = self.bdQ
        D = D.at[qblk, qo1, qo2].add(self.q_data[tq])
        st1, st2, srows, sblk, so1, so2 = self.bdAsub
        E = jnp.zeros((max(nb - 1, 1), b, b), dt).at[sblk, so1, so2].add(
            self.a_data[st1] * self.a_data[st2] * w[srows])
        sq, sqblk, sqo1, sqo2 = self.bdQsub
        E = E.at[sqblk, sqo1, sqo2].add(self.q_data[sq])

        idx = jnp.arange(b)
        diag = D[:, idx, idx]
        shift = sigma if settings.proximal else jnp.asarray(0.0, dt)
        # lift exactly-zero diagonals (padded tail / untouched variables)
        bump = jnp.where(diag + shift > 0, shift, shift + 1.0)
        D = D.at[:, idx, idx].add(bump)

        # Symmetric Jacobi equilibration (state dtype, BEFORE the
        # factorization downcast): K's conditioning on aggressive mu
        # schedules is dominated by diagonal scale disparity — W rows at
        # 1/mu_min vs O(1) — which a reduced-precision factorization
        # cannot carry (the round-4 level-5625 on-TPU failures sit at the
        # f32-refinement convergence boundary cond*eps32 ~ 1).  Factor
        # S K S with S = diag(K)^{-1/2} instead: the scaled system's
        # diagonal is exactly 1, the scale disparity is gone, and the
        # solve wrapper applies dx = S z.  O(n) cost per assembly.
        if settings.banded_jacobi_scale:
            s = jax.lax.rsqrt(D[:, idx, idx])              # (nb, b), dt
            D = D * s[:, :, None] * s[:, None, :]
            if nb > 1:
                # E_k = K[block k+1, block k]
                E = E * s[1:, :, None] * s[:-1, None, :]
        else:
            s = jnp.ones((nb, b), dt)

        # reduced-precision factorization + state-dtype refinement, same
        # contract as the dense path (ops/linalg.newton_system_solve)
        kdt = jnp.dtype(settings.kkt_dtype) if settings.kkt_dtype else dt
        if kdt != dt:
            D, E = D.astype(kdt), E.astype(kdt)
        return D, E, s

    @staticmethod
    def _banded_factor_scan_hr(D, E):
        """``_banded_factor_scan`` built from hand-rolled block Cholesky
        and substitutions (``_chol_unrolled``/``_tri_solve_unrolled``) —
        no ``lax.linalg`` anywhere, so it runs in float64 on backends
        whose native Cholesky cannot (axon TPU: a float64
        ``jnp.linalg.cholesky`` crashes the device, while the emulated
        elementwise mul/add/sqrt/div are fine).  The state-dtype
        escalation path of ``_banded_solve`` uses this on non-CPU
        backends; semantics identical to ``_banded_factor_scan``."""
        nb = D.shape[0]
        L0 = _chol_unrolled(D[0])

        def fstep(Lprev, DE):
            Dk, Ek = DE
            Mt = _tri_solve_unrolled_mat(Lprev, Ek.T)
            Lk = _chol_unrolled(Dk - Mt.T @ Mt)
            return Lk, (Lk, Mt)

        _, (Ls, Mts) = jax.lax.scan(fstep, L0, (D[1:], E[: nb - 1]))

        def solve(rb):
            u0 = _tri_solve_unrolled(L0, rb[0])

            def fwd(uprev, inp):
                Lk, Mt, rk = inp
                uk = _tri_solve_unrolled(Lk, rk - Mt.T @ uprev)
                return uk, uk

            _, us = jax.lax.scan(fwd, u0, (Ls, Mts, rb[1:]))
            U = jnp.concatenate([u0[None], us], axis=0)
            Llast = Ls[-1] if nb > 1 else L0
            zl = _tri_solve_unrolled(Llast, U[-1], trans=True)

            def bwd(znext, inp):
                Lk, Mtk1, uk = inp
                zk = _tri_solve_unrolled(Lk, uk - Mtk1 @ znext, trans=True)
                return zk, zk

            Lall = jnp.concatenate([L0[None], Ls], axis=0)
            _, zs = jax.lax.scan(bwd, zl, (Lall[:-1], Mts, U[:-1]),
                                 reverse=True)
            return jnp.concatenate([zs, zl[None]], axis=0)

        return solve

    @staticmethod
    def _banded_factor_scan(D, E):
        """Sequential block-tridiagonal Cholesky: K = L L' with
        block-bidiagonal L, factored by a ``lax.scan`` of b x b block
        steps.  O(nb) depth — the CPU/latency-optimal variant.  Returns
        solve(rb: (nb, b)) -> (nb, b)."""
        nb = D.shape[0]
        # L_0 = chol(D_0);  M_k' = L_{k-1}^{-1} E_{k-1}';
        # L_k = chol(D_k - M_k M_k')
        L0 = jnp.linalg.cholesky(D[0])

        def fstep(Lprev, DE):
            Dk, Ek = DE
            Mt = jax.scipy.linalg.solve_triangular(Lprev, Ek.T, lower=True)
            Lk = jnp.linalg.cholesky(Dk - Mt.T @ Mt)
            return Lk, (Lk, Mt)

        _, (Ls, Mts) = jax.lax.scan(fstep, L0, (D[1:], E[: nb - 1]))

        def solve(rb):
            # forward: u_k = L_k^{-1} (r_k - M_k u_{k-1})
            u0 = jax.scipy.linalg.solve_triangular(L0, rb[0], lower=True)

            def fwd(uprev, inp):
                Lk, Mt, rk = inp
                uk = jax.scipy.linalg.solve_triangular(
                    Lk, rk - Mt.T @ uprev, lower=True)
                return uk, uk

            _, us = jax.lax.scan(fwd, u0, (Ls, Mts, rb[1:]))
            U = jnp.concatenate([u0[None], us], axis=0)
            # backward: z_k = L_k^{-T} (u_k - M_{k+1}' z_{k+1})
            Llast = Ls[-1] if nb > 1 else L0
            zl = jax.scipy.linalg.solve_triangular(
                Llast, U[-1], lower=True, trans=1)

            def bwd(znext, inp):
                Lk, Mtk1, uk = inp
                zk = jax.scipy.linalg.solve_triangular(
                    Lk, uk - Mtk1 @ znext, lower=True, trans=1)
                return zk, zk

            Lall = jnp.concatenate([L0[None], Ls], axis=0)
            _, zs = jax.lax.scan(bwd, zl, (Lall[:-1], Mts, U[:-1]),
                                 reverse=True)
            return jnp.concatenate([zs, zl[None]], axis=0)

        return solve

    @staticmethod
    def _banded_factor_cr(D, E, max_levels: int = 0):
        """Block cyclic reduction: eliminate the odd-indexed blocks at
        every level (each level is one *batched* Cholesky + batched b x b
        GEMMs over ~k/2 blocks), halving the system until one block
        remains.  O(log nb) depth, ~2x the flops of the scan variant —
        the TPU-native trade: the scan factorization serializes nb tiny
        steps, CR rides the MXU with log2(nb) large batched ops.

        CR on an SPD block-tridiagonal matrix is exact block Gaussian
        elimination under the odd-even (nested-dissection) permutation:
        every eliminated pivot block is a principal submatrix of a Schur
        complement of an SPD matrix, hence SPD itself — stable in exact
        arithmetic, no pivoting needed.  In *float32* the story has a
        depth dimension: every level's Schur update D_e -= E D_o^{-1} E'
        re-rounds the pivot blocks, and the perturbations compound
        multiplicatively across the ~log2(nb) levels — at cond(K) ~ 1e7
        (mu_min ~ 1e-7 schedules) a full-depth f32 CR factor becomes
        unstable enough that even safeguarded refinement cannot converge,
        while the sequential scan factorization of the same system stays
        usable (RESULTS.md "level-704", reproduced on CPU).

        ``max_levels`` bounds the compounding: CR eliminates for at most
        that many levels (2^max_levels-fold reduction — the bulk of the
        batched-MXU win), then the stable scan factorization finishes the
        coarse remainder.  0 reduces all the way down (the pure-CR
        variant).  Returns solve(rb: (nb, b)) -> (nb, b)."""
        chs = lambda L, X: jax.scipy.linalg.solve_triangular(
            L, jax.scipy.linalg.solve_triangular(L, X, lower=True),
            lower=True, trans=1)
        zblk = jnp.zeros_like(D[:1])

        levels = []
        while D.shape[0] > 1 and (max_levels <= 0
                                  or len(levels) < max_levels):
            k = D.shape[0]
            no, ne = k // 2, k - k // 2
            # odd blocks j = 2t+1, t = 0..no-1; kept evens i = 2e
            Dodd = D[1::2]
            Lo = jnp.linalg.cholesky(Dodd)
            Epad = jnp.concatenate([E[: k - 1], zblk], axis=0)  # (k, b, b)
            Ejm1 = Epad[0::2][:no]          # E_{j-1} for odd j   (no, b, b)
            Ej = Epad[1::2][:no]            # E_j (zero when j = k-1)
            # D_j^{-1} E_{j-1} and D_j^{-1} E_j'
            Ua = chs(Lo, Ejm1)
            Ub = chs(Lo, jnp.swapaxes(Ej, -1, -2))
            # Schur updates onto the kept evens:
            #   from the left odd (j = 2e-1, t = e-1):  E_j D_j^{-1} E_j'
            #   from the right odd (j = 2e+1, t = e):   E_{j-1}' D_j^{-1} E_{j-1}
            left = Ej @ Ub                  # t-indexed; lands on even e = t+1
            right = jnp.swapaxes(Ejm1, -1, -2) @ Ua   # lands on even e = t
            Dnew = D[0::2]
            # when k is even the last odd (j = k-1) has no right even
            # neighbour — its Ej block is zero-padded, so the dropped
            # slice tail is exactly the zero contribution
            Dnew = Dnew.at[1:].add(-left[: ne - 1])
            Dnew = Dnew.at[:no].add(-right)
            # new sub-diagonal coupling kept (e, e+1):  -E_j D_j^{-1} E_{j-1}
            Enew = -(Ej @ Ua)[: ne - 1]
            levels.append((Lo, Ua, Ub, Ejm1, Ej, k, no, ne))
            D, E = Dnew, Enew
        if D.shape[0] == 1:
            Lfin = jnp.linalg.cholesky(D[0])
            coarse_solve = lambda r: chs(Lfin, r[0][:, None])[:, 0][None]
        else:
            # depth limit hit: finish the coarse remainder with the
            # sequential (stable) scan factorization
            coarse_solve = SparseOperator._banded_factor_scan(D, E)

        def solve(rb):
            rs_odd = []
            r = rb
            for Lo, Ua, Ub, Ejm1, Ej, k, no, ne in levels:
                yo = chs(Lo, r[1::2][..., None])[..., 0]      # (no, b)
                rs_odd.append(yo)
                rnew = r[0::2]
                rnew = rnew.at[1:].add(
                    -(Ej @ yo[..., None])[..., 0][: ne - 1])
                rnew = rnew.at[:no].add(
                    -(jnp.swapaxes(Ejm1, -1, -2) @ yo[..., None])[..., 0])
                r = rnew
            x = coarse_solve(r)                               # (kc, b)
            for (Lo, Ua, Ub, Ejm1, Ej, k, no, ne), yo in zip(
                    reversed(levels), reversed(rs_odd)):
                xe = x                                         # (ne, b)
                xl = xe[:no]                                   # x_{j-1}, e = t
                xr = jnp.concatenate(                          # x_{j+1}, e = t+1
                    [xe[1:], jnp.zeros_like(xe[:1])], axis=0)[:no]
                xo = yo - (Ua @ xl[..., None])[..., 0] \
                    - (Ub @ xr[..., None])[..., 0]
                x = jnp.zeros((k,) + xe.shape[1:], xe.dtype)
                x = x.at[0::2].set(xe).at[1::2].set(xo)
            return x

        return solve

    def _banded_solve(self, w, sigma, rhs, settings: Settings):
        """Exact block-tridiagonal direct solve of K dx = rhs — the
        banded-pattern replacement of the reference's sparse LDL'
        factorize+solve (cholmod_interface.c:8-30, 98-102): exact (no CG
        iteration), O(n b^2) work, O(n b) memory.  Two factorization
        algorithms (Settings.banded_algo): "scan" (sequential block
        Cholesky, O(nb) depth — CPU) and "cr" (block cyclic reduction,
        O(log nb) depth of batched MXU ops — TPU); "auto" picks by
        backend at trace time.

        The CR path carries an ACCURACY-GATED SCAN FALLBACK
        (Settings.banded_cr_fallback_rtol): in float32 at cond(K) ~ 1e7
        (aggressive mu schedules) the CR Schur updates
        D_e -= E D_o^{-1} E' cancel catastrophically on specific
        active-set configurations — the blocks are O(1/mu) while the
        complement is O(1), so f32 roundoff leaves O(1) *relative* error
        — and the resulting direction is garbage (measured along the real
        LISWET level-704 trajectory: direction error O(1)-NaN at a few
        iterations, at ANY CR depth, while the sequential scan stays at
        ~5e-2; scripts/cr_traj_diag.py).  The gate measures the true
        refined residual of the CR solve (one O(nnz) matvec it already
        pays) and only on failure re-solves with the scan factorization
        inside a ``lax.cond`` — log-depth speed on the common path,
        scan robustness on the rare cancellation step.  NaN residuals
        fail the gate by construction.  (Under vmap the cond lowers to a
        select and both paths execute — batched banded fleets pay the
        scan cost; set banded_cr_fallback_rtol=0 there if measured.)"""
        dt = self.dtype
        nb, b = self.bd_tmpl.shape
        n = self.n
        pad = nb * b - n
        kdt = jnp.dtype(settings.kkt_dtype) if settings.kkt_dtype else dt

        D, E, s = self._assemble_banded(w, sigma, settings)
        # flat Jacobi scale (state dtype): the factor solves S K S z = S r,
        # the wrapper returns dx = S z — refinement below always runs on
        # the TRUE (unscaled) system
        s_flat = s.reshape(-1)[:n]
        algo = settings.banded_algo
        if algo == "auto":
            algo = "scan" if jax.default_backend() == "cpu" else "cr"

        proximal = settings.proximal

        def Kmv(v):
            Kv = self.Qmv(v) + self.Atmv(w * self.Amv(v))
            if proximal:
                Kv = Kv + sigma * v
            return Kv

        def run(block_solve):
            """Solve + refinement with one factor.  Returns
            (dx, ||rhs - K dx||).

            DEFAULT (banded_pcg_refine > 0): state-dtype PCG on the TRUE
            system preconditioned by the reduced-precision factor.  At
            cond(K) ~ 1/mu_min the f32 factor's direction error floors
            at ~5e-2 and Richardson refinement cannot contract
            (cond*eps32 > 1 — the round-4 LISWET tail stalls, CPU cold
            MAX_ITER at levels 5625/11250 and the on-TPU ladder
            failures); Krylov deflates the handful of outlier modes the
            stationary iteration cannot, restoring ~state-eps directions
            at 1 factor apply + 1 O(nnz) matvec per iteration with early
            exit (typically 2-3 iterations).

            FALLBACK (banded_pcg_refine = 0): monotone-safeguarded
            Richardson, mirroring ops/linalg.newton_system_solve (an
            unstable factor amplifies refinement explosively — measured
            rd 1e12 after 3 unguarded sweeps, RESULTS.md "level-704");
            keep the better iterate by true residual."""
            def solve(r):
                r = (r * s_flat).astype(kdt)
                rp = (jnp.concatenate([r, jnp.zeros((pad,), kdt)])
                      if pad else r)
                z = block_solve(rp.reshape(nb, b)).reshape(-1).astype(dt)
                z = (z[:n] if pad else z) * s_flat
                return z

            pcg_iters = int(getattr(settings, "banded_pcg_refine", 0))
            if pcg_iters > 0:
                from .ops.cg import pcg
                # rel-tol 1e-9 (f64): the achievable PCG floor is
                # ~eps(dt)*cond(K), so a tighter target would never
                # early-exit on any cond > ~1e2 system and every solve
                # would burn the full iteration cap.  1e-9 directions
                # are proven sufficient down to mu_min = 1e-7 (round-4a
                # LISWET fix); beyond that the f32 factor itself breaks
                # down (NaN at cond > 1/eps32) and the STATE-DTYPE
                # ESCALATION below — not a tighter Krylov target — is
                # what restores the direction
                # (logs/liswet5625_isolate_mu1e9.log: budget/tolerance
                # changes were bit-identical no-ops on the NaN factor).
                tol = 1e-9 if dt == jnp.dtype(jnp.float64) else 1e-5
                dx, _, rel = pcg(Kmv, rhs, solve, tol, pcg_iters)
                rn = rel * jnp.maximum(jnp.linalg.norm(rhs),
                                       jnp.asarray(1e-30, dt))
                return dx, rn

            dx = solve(rhs)
            r = rhs - Kmv(dx)
            rn = jnp.linalg.norm(r)
            for _ in range(settings.refine_steps):
                dx_new = dx + solve(r)
                r_new = rhs - Kmv(dx_new)
                rn_new = jnp.linalg.norm(r_new)
                better = rn_new < rn
                dx = jnp.where(better, dx_new, dx)
                r = jnp.where(better, r_new, r)
                rn = jnp.where(better, rn_new, rn)
            return dx, rn

        # STATIC robustness gating (Settings.robust_gate_auto): both
        # fallback branches below exist only for reduced-precision
        # factors at extreme cond(K) ~ 1/mu_min; kkt_dtype and mu_min
        # are static settings, so the decision whether to COMPILE each
        # branch at all is made here, at trace time — a batched fleet at
        # mu_min >= 1e-7 carries no escalation select under vmap (the
        # +35%/batch tax, RESULTS.md), while mu_min = 1e-9 programs keep
        # full robustness.  Mirrors the dense kkt_pcg_refine=-1 rule.
        auto = getattr(settings, "robust_gate_auto", True)
        reduced_factor = jnp.finfo(kdt).eps > 1e-10

        if algo == "cr":
            dx, rn = run(self._banded_factor_cr(
                D, E, settings.banded_cr_levels))
            rtol = settings.banded_cr_fallback_rtol
            if rtol > 0 and (not auto or (
                    reduced_factor
                    and settings.mu_min < _CR_FALLBACK_MU_FLOOR)):
                rhs_n = jnp.maximum(jnp.linalg.norm(rhs),
                                    jnp.asarray(1e-30, dt))
                ok = rn <= rtol * rhs_n          # False on NaN -> fallback

                def scan_fallback(_):
                    return run(self._banded_factor_scan(D, E))

                dx, rn = jax.lax.cond(
                    ok, lambda _: (dx, rn), scan_fallback, None)
        else:
            dx, rn = run(self._banded_factor_scan(D, E))

        # STATE-DTYPE ESCALATION (Settings.banded_escalate_rtol): when
        # the reduced-precision factor + PCG refinement cannot deliver
        # the direction — the f32 Cholesky mathematically breaks down
        # once cond(S K S) > 1/eps32, i.e. exactly the mu ~ 1e-9 regime
        # the reference's f64 LDL' factors routinely
        # (cholmod_interface.c:8-30, constants.h:55) — re-solve with an
        # exact state-dtype scan factorization.  NaN residuals fail the
        # gate by construction (NaN <= x is False).  On CPU this is the
        # native Cholesky; on TPU the hand-rolled unrolled variant
        # (``_banded_factor_scan_hr``) avoids the f64-cholesky device
        # crash.  Under vmap the cond lowers to a select and batched
        # fleets pay the state-dtype factor cost always — set
        # banded_escalate_rtol=0 there if measured (same caveat as the
        # CR fallback above).
        esc_rtol = getattr(settings, "banded_escalate_rtol", 0.0)
        if esc_rtol > 0 and kdt != dt and (
                not auto or settings.mu_min < _ESCALATE_MU_FLOOR):
            rhs_n = jnp.maximum(jnp.linalg.norm(rhs),
                                jnp.asarray(1e-30, dt))
            esc_ok = rn <= esc_rtol * rhs_n

            def exact_path(_):
                D64, E64, s64 = self._assemble_banded(
                    w, sigma, settings.replace(kkt_dtype=None))
                s64_flat = s64.reshape(-1)[:n]
                factor = (self._banded_factor_scan(D64, E64)
                          if jax.default_backend() == "cpu"
                          else self._banded_factor_scan_hr(D64, E64))

                def solve64(r):
                    r = r * s64_flat
                    rp64 = (jnp.concatenate([r, jnp.zeros((pad,), dt)])
                            if pad else r)
                    z = factor(rp64.reshape(nb, b)).reshape(-1)
                    return (z[:n] if pad else z) * s64_flat

                dx2 = solve64(rhs)
                # one exact-residual correction sweep (state-dtype factor
                # at state-dtype data: brings the direction to ~eps(dt))
                dx2 = dx2 + solve64(rhs - Kmv(dx2))
                return dx2

            dx = jax.lax.cond(esc_ok, lambda _: dx, exact_path, None)
        finite = jnp.all(jnp.isfinite(dx))
        return jnp.where(finite, dx, jnp.zeros_like(dx))

    def newton_solve(self, active, mu, sigma, rhs, settings: Settings,
                     dx_prev=None, tol_hint=None):
        """Matrix-free CG on K dx = rhs, warm-started from the previous
        Newton direction (the systems change slowly across iterations;
        replaces the factorization event of newton.c:21-49 for problems
        too large to densify).  Banded patterns take the exact
        block-tridiagonal direct solve instead (``_banded_solve``).

        ``tol_hint`` (the current inner tolerance eps_in) drives an
        Eisenstat-Walker-style forcing term: early subproblems only need
        directions accurate to a fraction of eps_in, so the relative CG
        tolerance is max(cg_tol, 0.05 * eps_in / ||rhs||) capped at 1e-2
        — the final subproblems still solve to cg_tol.

        ``Settings.cg_dtype`` selects the mixed-precision variant
        (ops/cg.pcg_refined): inner CG entirely in the reduced dtype —
        matvecs *and* preconditioner — inside a state-dtype
        iterative-refinement loop, so on TPU the per-CG-iteration O(nnz)
        work runs at native float32 speed."""
        from .ops.cg import pcg, pcg_refined

        w = active / mu
        if self.bd_tmpl is not None and settings.newton_direct:
            return self._banded_solve(w, sigma, rhs, settings)
        proximal = settings.proximal

        def Kmv(v):
            Kv = self.Qmv(v) + self.Atmv(w * self.Amv(v))
            if proximal:
                Kv = Kv + sigma * v
            return Kv

        tol = settings.cg_tol
        if tol_hint is not None:
            rhs_norm = jnp.maximum(jnp.linalg.norm(rhs), 1e-30)
            tol = jnp.clip(0.05 * tol_hint / rhs_norm,
                           settings.cg_tol, 1e-2)

        cg_dt = (jnp.dtype(settings.cg_dtype) if settings.cg_dtype
                 else None)
        if cg_dt is not None and cg_dt != jnp.dtype(self.dtype):
            op_lo = self.cast(cg_dt)
            w_lo = w.astype(cg_dt)
            sigma_lo = sigma.astype(cg_dt)

            def Kmv_lo(v):
                Kv = op_lo.Qmv(v) + op_lo.Atmv(w_lo * op_lo.Amv(v))
                if proximal:
                    Kv = Kv + sigma_lo * v
                return Kv

            d_lo = op_lo.diag_K(active.astype(cg_dt), mu.astype(cg_dt),
                                sigma_lo, proximal)
            dinv_lo = jnp.where(d_lo > 0,
                                1.0 / jnp.where(d_lo > 0, d_lo, 1.0), 1.0)
            if settings.precond == "block_jacobi" and self.pjA is not None:
                precond_lo = op_lo._block_jacobi_apply(
                    w_lo, sigma_lo, dinv_lo, settings)
            else:
                precond_lo = dinv_lo
            dx, _, _ = pcg_refined(Kmv, Kmv_lo, rhs, precond_lo, tol,
                                   settings.cg_max_iter,
                                   settings.cg_refine_rounds, cg_dt,
                                   x0=dx_prev)
            finite = jnp.all(jnp.isfinite(dx))
            return jnp.where(finite, dx, jnp.zeros_like(dx))

        d = self.diag_K(active, mu, sigma, proximal)
        dinv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 1.0)
        if settings.precond == "block_jacobi" and self.pjA is not None:
            precond = self._block_jacobi_apply(w, sigma, dinv, settings)
        else:
            precond = dinv
        dx, _, _ = pcg(Kmv, rhs, precond, tol,
                       settings.cg_max_iter, x0=dx_prev)
        # NaN guard, mirroring the dense path (ops/linalg.py:141-145)
        finite = jnp.all(jnp.isfinite(dx))
        return jnp.where(finite, dx, jnp.zeros_like(dx))

    def cast(self, dtype) -> "SparseOperator":
        from_dt = self.dtype
        return jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == from_dt else a, self)


# ---------------------------------------------------------------------------
# Block-angular operator (scenario-structured / tensor-parallel path)
# ---------------------------------------------------------------------------

class BlockAngularOperator(NamedTuple):
    """Scenario-structured (block-angular) QP with arrow-KKT Newton solves.

    Problems  min 0.5 x0'Q0 x0 + sum_s 0.5 xs'Qs xs + q0'x0 + sum_s qs'xs
              s.t.  l_s <= T_s x0 + W_s x_s <= u_s
    (two-stage stochastic programs, scenario MPC).  The semismooth-Newton
    KKT matrix is exactly arrow-structured, so every Newton solve is a
    Schur complement over scenario-local Cholesky factorizations
    (ops/schur.py algebra) — shard the leading S axis of the leaves over a
    ``jax.sharding.Mesh`` and XLA inserts one psum per Newton iteration.

    Primal vectors are ``(x0, xs)`` tuples with shapes ((n0,), (S, ns));
    dual vectors are single (S, ms) arrays.  Build scaled via
    ``solver.structured.scale_block_angular``.  No reference equivalent
    (the reference is single-threaded); algorithm semantics are the
    generic core's, which cites the reference line-by-line.
    """

    Q0: jax.Array    # (n0, n0)
    Qs: jax.Array    # (S, ns, ns)
    T: jax.Array     # (S, ms, n0)
    W: jax.Array     # (S, ms, ns)
    q: Any           # (q0 (n0,), qs (S, ns))
    l: jax.Array     # (S, ms)
    u: jax.Array     # (S, ms)
    c: jax.Array     # scalar
    D: Any           # (D0, Ds)
    Dinv: Any
    E: jax.Array     # (S, ms)
    Einv: jax.Array
    cost: jax.Array
    cinv: jax.Array
    l_finite: jax.Array
    u_finite: jax.Array

    @property
    def dtype(self):
        return self.Q0.dtype

    def zeros_primal(self):
        S, ms, n0 = self.T.shape
        ns = self.W.shape[-1]
        return (jnp.zeros((n0,), self.dtype), jnp.zeros((S, ns), self.dtype))

    def zeros_dual(self):
        S, ms, _ = self.T.shape
        return jnp.zeros((S, ms), self.dtype)

    def _cast_mats(self, dtype):
        if dtype is None or jnp.dtype(dtype) == self.dtype:
            return self.Q0, self.Qs, self.T, self.W, None
        to = lambda a: a.astype(dtype)
        return to(self.Q0), to(self.Qs), to(self.T), to(self.W), dtype

    def Qmv(self, x, dtype=None):
        Q0, Qs, _, _, kdt = self._cast_mats(dtype)
        x0, xs = x
        if kdt is not None:
            x0, xs = x0.astype(kdt), xs.astype(kdt)
        r0 = Q0 @ x0
        rs = jnp.einsum("sij,sj->si", Qs, xs)
        if kdt is not None:
            r0, rs = r0.astype(self.dtype), rs.astype(self.dtype)
        return (r0, rs)

    def Amv(self, x, dtype=None):
        _, _, T, W, kdt = self._cast_mats(dtype)
        x0, xs = x
        if kdt is not None:
            x0, xs = x0.astype(kdt), xs.astype(kdt)
        r = (jnp.einsum("smn,n->sm", T, x0)
             + jnp.einsum("smk,sk->sm", W, xs))
        return r.astype(self.dtype) if kdt is not None else r

    def Atmv(self, y, dtype=None):
        _, _, T, W, kdt = self._cast_mats(dtype)
        yk = y.astype(kdt) if kdt is not None else y
        r0 = jnp.einsum("smn,sm->n", T, yk)
        rs = jnp.einsum("smk,sm->sk", W, yk)
        if kdt is not None:
            r0, rs = r0.astype(self.dtype), rs.astype(self.dtype)
        return (r0, rs)

    def Amv2(self, xa, xb):
        X0 = jnp.stack([xa[0], xb[0]], axis=-1)        # (n0, 2)
        Xs = jnp.stack([xa[1], xb[1]], axis=-1)        # (S, ns, 2)
        R = (jnp.einsum("smn,nk->smk", self.T, X0)
             + jnp.einsum("smj,sjk->smk", self.W, Xs))  # (S, ms, 2)
        return R[..., 0], R[..., 1]

    def Atmv2(self, ya, yb):
        Y = jnp.stack([ya, yb], axis=-1)               # (S, ms, 2)
        R0 = jnp.einsum("smn,smk->nk", self.T, Y)      # (n0, 2)
        Rs = jnp.einsum("smj,smk->sjk", self.W, Y)     # (S, ns, 2)
        return (R0[..., 0], Rs[..., 0]), (R0[..., 1], Rs[..., 1])

    def Qmv2(self, xa, xb):
        X0 = jnp.stack([xa[0], xb[0]], axis=-1)        # (n0, 2)
        Xs = jnp.stack([xa[1], xb[1]], axis=-1)        # (S, ns, 2)
        R0 = self.Q0 @ X0
        Rs = jnp.einsum("sij,sjk->sik", self.Qs, Xs)
        return (R0[..., 0], Rs[..., 0]), (R0[..., 1], Rs[..., 1])

    def newton_solve(self, active, mu, sigma, rhs, settings: Settings,
                     dx_prev=None, tol_hint=None):
        """Arrow-KKT Schur-complement solve (ops/schur.py algebra, inlined
        so XLA can shard the S axis; one all-reduce per call)."""
        from .ops.linalg import cholesky_solve

        r0, rs = rhs
        w = active / mu                                # (S, ms)
        n0 = self.Q0.shape[0]
        ns = self.W.shape[-1]
        dt = self.dtype
        refine = settings.refine_steps
        wT = w[..., None] * self.T                     # (S, ms, n0)
        wW = w[..., None] * self.W
        K00 = self.Q0 + jnp.einsum("smn,smk->nk", self.T, wT)
        Kss = self.Qs + jnp.einsum("smi,smj->sij", self.W, wW)
        Bs = jnp.einsum("smi,smj->sij", self.W, wT)    # (S, ns, n0)
        if settings.proximal:
            K00 = K00 + sigma * jnp.eye(n0, dtype=dt)
            Kss = Kss + sigma * jnp.eye(ns, dtype=dt)

        def local(Kb, Bb, rb):
            rhs_b = jnp.concatenate([Bb, rb[:, None]], axis=1)
            sol = cholesky_solve(Kb, rhs_b, refine)
            return (Bb.T @ sol[:, :-1], Bb.T @ sol[:, -1],
                    sol[:, :-1], sol[:, -1])

        SB, Sr, KinvB, Kinvr = jax.vmap(local)(Kss, Bs, rs)
        S0 = K00 - jnp.sum(SB, axis=0)                 # psum over S
        rhs0 = r0 - jnp.sum(Sr, axis=0)
        dx0 = cholesky_solve(S0, rhs0, refine)
        dxs = Kinvr - jnp.einsum("sij,j->si", KinvB, dx0)
        # factorization-failure guard, mirroring the dense path
        finite = jnp.all(jnp.isfinite(dx0)) & jnp.all(jnp.isfinite(dxs))
        return (jnp.where(finite, dx0, jnp.zeros_like(dx0)),
                jnp.where(finite, dxs, jnp.zeros_like(dxs)))

    def cast(self, dtype) -> "BlockAngularOperator":
        from_dt = self.dtype
        return jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == from_dt else a, self)
