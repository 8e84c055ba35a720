"""Core pytree types of the TPU-native QPDO solver.

Functional equivalents of the reference C structs (reference: include/types.h):

* ``Problem``    <- ``QPDOData``      (types.h:81-90), dense jnp arrays
* ``Settings``   <- ``QPDOSettings``  (types.h:96-116), a frozen, hashable
  dataclass passed statically into jit (settings changes recompile)
* ``Scaling``    <- ``QPDOScaling``   (types.h:40-47)
* ``SolverState``<- the iterate subset of ``QPDOWorkspace`` (types.h:147-224)
  that must survive across iterations; everything else is recomputed
* ``Info``       <- ``QPDOInfo``      (types.h:53-72)
* ``Result``     <- the 5-output MEX contract (interfaces/mex/qpdo_mex.c:227-281)

Design notes (TPU-first):
- No workspace mutation: one ``SolverState`` pytree flows through
  ``lax.while_loop``.  Cached products Qx/Ax/Aty are state fields updated
  incrementally after the linesearch, like the reference does
  (src/iteration.c:19-24).
- All arrays have static shapes; the active set is a {0,1} weight vector, not
  an index set.
- Everything vmaps: a batch of problems is just a leading axis on every leaf.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax

from . import constants as _c


class Problem(NamedTuple):
    """A convex QP: minimize 0.5 x'Qx + q'x + c  s.t.  l <= Ax <= u.

    Dense, unscaled user data (reference: QPDOData, include/types.h:81-90).
    ``Q`` must be symmetric PSD (possibly singular).  Bounds may contain
    +-inf; they are clamped to +-QPDO_INFTY at setup (interfaces/mex/qpdo.m
    clamps the same way).
    """

    Q: jax.Array  # (n, n)
    q: jax.Array  # (n,)
    A: jax.Array  # (m, n)
    l: jax.Array  # (m,)
    u: jax.Array  # (m,)
    c: jax.Array  # scalar, constant cost term

    @property
    def n(self) -> int:
        return self.Q.shape[-1]

    @property
    def m(self) -> int:
        return self.A.shape[-2]


@dataclasses.dataclass(frozen=True)
class Settings:
    """Solver settings (reference: QPDOSettings, include/types.h:96-116).

    Fully static/hashable: pass to jitted entry points as a static argument.
    Defaults mirror include/constants.h:44-69, with one deliberate
    deviation: ``verbose`` defaults to False (the reference defaults to
    TRUE, constants.h:65 — sensible for an interactive MATLAB tool, not
    for a library embedded in jitted pipelines).
    """

    max_time: float = _c.MAX_TIME
    max_iter: int = _c.MAX_ITER
    inner_max_iter: int = _c.INNER_MAX_ITER
    eps_abs: float = _c.EPS_ABS
    eps_abs_in: float = _c.EPS_ABS_IN
    eps_prim_inf: float = _c.EPS_PRIM_INF
    eps_dual_inf: float = _c.EPS_DUAL_INF
    rho: float = _c.RHO
    theta: float = _c.THETA
    delta: float = _c.DELTA
    mu_min: float = _c.MU_MIN
    proximal: bool = _c.PROXIMAL
    sigma_init: float = _c.SIGMA_INIT
    sigma_upd: float = _c.SIGMA_UPD
    sigma_min: float = _c.SIGMA_MIN
    scaling: int = _c.SCALING
    verbose: bool = _c.VERBOSE
    print_interval: int = _c.PRINT_INTERVAL
    reset_newton_iter: int = _c.RESET_NEWTON_ITER
    # --- TPU-specific extensions (no reference equivalent) ---
    # Iterative-refinement sweeps on the Newton solve; >0 recommended for
    # float32 on TPU, 0 is fine in float64.
    refine_steps: int = 1
    # Precision of the KKT formation + Cholesky (e.g. "float32" while the
    # solver state is float64): keeps the O(mn^2)+O(n^3) work on the fast
    # MXU path, with refinement recovering state-dtype accuracy.
    # None = same dtype as the problem data.
    # NOTE: a bare float32 factorization cannot carry cond(K) ~ 1/mu
    # beyond ~1e7 — but with the round-4 default kkt_pcg_refine=-1
    # (auto), mu_min < 1e-7 engages Krylov refinement that restores
    # state-accurate directions, so kkt_dtype="float32" is safe even at
    # the reference's mu_min=1e-9 default.  Set mu_min >= 1e-7 where the
    # cheaper Richardson refinement suffices (all the shipped bench
    # configs do).
    kkt_dtype: str | None = None
    # Two-phase precision ("hybrid warmup"): run the whole solver in float32
    # to ``warmup_eps`` (with a float32-safe mu floor), then upcast the
    # state to the problem dtype, recompute the caches exactly, and polish
    # to eps_abs.  On TPU (emulated float64) this moves ~80% of the
    # iterations onto the 5x-faster float32 path.  Ignored for float32
    # problem data.
    hybrid_warmup: bool = False
    warmup_eps: float = 1e-3
    warmup_mu_min: float = 1e-4
    # Warmup stall guard: on chained-constraint families (LISWET-class) the
    # float32 mu floor (warmup_mu_min) can stall the penalty schedule — the
    # primal residual plateaus while phase 1 burns its whole iteration cap
    # (a measured 22x iteration blowup, RESULTS.md dense-family sweep).
    # At every phase-1 outer update with oter >= 2, if the primal residual
    # failed to shrink below ``warmup_stall_exit`` times its value at the
    # previous outer update, the problem exits to the accurate phase
    # immediately.  0.0 disables (pre-round-3 behaviour).
    warmup_stall_exit: float = 0.9
    # Iterative-refinement sweeps per Newton solve in phase 1.  The warmup
    # factors AND carries state in float32, so a refinement sweep (one
    # exact K matvec + a triangular-solve pair = 3 MXU ops) cannot push
    # accuracy past the float32 state floor — measured zero effect on the
    # bench batch's iteration counts at 0.  Kept at 1 by default (reference
    # caution on ill-conditioned warmups); 0 is the measured-safe op-count
    # cut for op-rate-bound parts (RESULTS.md round-3 bench sweep).
    warmup_refine_steps: int = 1
    # INTERNAL: per-phase copy of warmup_stall_exit, nonzero only inside
    # the phase-1 settings built by warmup_settings() — step() reads this,
    # so the guard can never fire in a plain (non-hybrid) solve.
    stall_exit: float = 0.0
    # Warm-start penalty adaptation: scale the initial mu by the warm
    # point's KKT residual, clipped below at warm_mu_scale_min (see
    # solver/core.py init_state).  Near-optimal warm starts (the MPC
    # re-solve workflow) then converge in a handful of iterations instead
    # of re-walking the whole penalty schedule.  Set False for exact
    # reference warm-start semantics.
    warm_mu_adapt: bool = True
    warm_mu_scale_min: float = 1e-2
    # Exact-linesearch root finder: "sort" (sorted breakpoint scan,
    # linesearch.c parity) or "bisect" (sort-free safeguarded segment
    # iteration — identical results, avoids the 2m-element sort; the right
    # choice when constraint rows are sharded over devices).
    linesearch: str = "sort"
    # Precision of the infeasibility-certificate matvecs (A dx_c, A' dy_c,
    # Q dx_c).  The certificate tests (termination.c:97-216) are
    # eps-relative at eps_inf = 1e-6; a float32 matvec contributes ~1e-7
    # relative noise — inside the tests' margin — while removing the
    # certificate columns from the per-iteration emulated-float64 GEMMs on
    # TPU (the Newton direction's own matvecs stay in the state dtype).
    # None = state dtype (exact reference semantics).
    cert_dtype: str | None = None
    # Precision of the exact-linesearch root find (the 2m-element sort /
    # bisection).  tau only needs ~sqrt(eps) relative accuracy (the merit
    # is smooth at its root), so "float32" moves the per-iteration sort
    # off the emulated-float64 path on TPU.  None = state dtype.
    linesearch_dtype: str | None = None
    # Precision of the per-iteration A dx / A' dy GEMMs in the accurate
    # phase ("anchored phase 2").  With e.g. "float32", the full-size
    # GEMMs run in reduced precision and only each problem's ``hard_rows``
    # smallest-mu rows get an exact gathered (k, n) product — the one
    # place where the mu-division amplifies reduced-precision noise
    # (docs/design-notes.md error analysis; operators.DenseOperator
    # Amv_mixed/Atmv_mixed).  None = state dtype (exact reference
    # arithmetic).  Dense operator only; other operators ignore it.
    phase2_gemm_dtype: str | None = None
    # Number of exact smallest-mu rows in the mixed GEMMs above.
    hard_rows: int = 16
    # Anchor cadence of the mixed-GEMM mode: every ``anchor_every``
    # iterations the Qx/Ax/Aty caches are recomputed with exact
    # state-dtype matvecs inside the jitted loop (a nested while_loop), so
    # reduced-precision increment drift is bounded by a K-step window;
    # combined with the 10% latch margin (solver/core.py) the *true* KKT
    # residual of a SOLVED result stays within eps_abs.
    anchor_every: int = 8
    # --- large-n sparse path (SparseOperator, ops/cg.py) ---
    # Relative residual tolerance of the preconditioned-CG Newton solve
    # (the matrix-free replacement of the sparse LDL' factorization,
    # cholmod_interface.c:8-52).  Plays the role refine_steps plays on the
    # dense path: tight enough that the inner loop can reach eps_in.
    cg_tol: float = 1e-8
    # Static CG iteration cap (early exit on convergence).
    cg_max_iter: int = 500
    # Ruiz-equilibrate Q jointly with A over the full KKT structure
    # [[Q, A'], [A, 0]] (scaling.ruiz_equilibrate_kkt) instead of the
    # reference's A-only Ruiz (scaling.c:36-63).  Fixes the
    # iteration-count blowup on wide-scale Q (diag entries spanning many
    # decades, CVXQP-style) that A-only scaling leaves in every Newton
    # system; opt-in because it changes the scaled-space trajectory
    # (results are identical in unscaled space up to tolerance).
    ruiz_kkt: bool = False
    # Precision of the CG inner solves (matvecs + preconditioner), e.g.
    # "float32" while the state is float64: the O(nnz)-per-iteration hot
    # path runs at native TPU speed inside a state-dtype
    # iterative-refinement loop (ops/cg.pcg_refined) — only one exact
    # residual refresh per refinement round pays the emulated-float64
    # cost.  Same caveat as kkt_dtype: float32 inner solves cannot carry
    # cond(K) ~ 1/mu beyond ~1e7, so combine with mu_min >= 1e-7.
    # None = state dtype (single full-precision CG).
    cg_dtype: str | None = None
    # Max iterative-refinement rounds of the mixed-precision CG (each
    # round is one inner CG + one state-dtype residual refresh; the loop
    # exits early once the Newton tolerance is met).
    cg_refine_rounds: int = 4
    # CG preconditioner: "block_jacobi" factors the block diagonal of K
    # (extracted matrix-free from the sparsity pattern) with a *batched*
    # dense Cholesky — MXU-friendly, and the difference between stalling
    # and converging on banded/PDE-structured K (LISWET/AUG-style) where
    # plain "jacobi" does nothing.  Falls back to "jacobi" automatically
    # when the pattern would make block extraction too expensive.
    precond: str = "block_jacobi"
    # Block size of the block-Jacobi preconditioner.
    precond_block: int = 64
    # Dtype of the preconditioner FACTORIZATION (block-Jacobi dense
    # Cholesky + coarse factor), e.g. "float32" while the state is
    # float64.  A preconditioner only steers CG — its factorization
    # precision affects the iteration count, never the answer — and
    # float32 keeps the batched Cholesky off the TPU's fragile emulated-
    # float64 path (a pure-f64 batched Cholesky has crashed the axon
    # device).  None = state dtype (exact CPU-parity trajectories).
    precond_dtype: str | None = None
    # Banded direct Newton solves: when the sparse setup detected a
    # banded KKT pattern (bandwidth <= setup_sparse's banded_max_bw), use
    # the exact block-tridiagonal Cholesky (operators._banded_solve) in
    # place of CG — the sparse-direct analogue of the reference's CHOLMOD
    # factorize+solve (cholmod_interface.c:8-30, 98-102).  False forces
    # the CG path even when the banded maps exist.
    newton_direct: bool = True
    # Banded factorization algorithm: "scan" = sequential block-tridiagonal
    # Cholesky (O(nb) depth — latency-optimal on CPU), "cr" = block cyclic
    # reduction (O(log nb) depth of batched MXU block ops, ~2x flops — the
    # TPU-native variant), "auto" = pick by backend at trace time.
    banded_algo: str = "auto"
    # Depth limit of the cyclic-reduction factorization (0 = reduce all
    # the way to one block): CR eliminates for at most this many levels,
    # then the sequential scan factorization finishes the coarse
    # remainder.  A perf knob, NOT a stability knob: the level-704
    # divergence was measured at EVERY depth (the unstable Schur
    # cancellation happens in the first levels; scripts/cr_traj_diag.py)
    # — stability comes from banded_cr_fallback_rtol below.  0 keeps the
    # full O(log nb) depth, the TPU-optimal choice.
    banded_cr_levels: int = 0
    # Accuracy gate on the CR direction (0 disables): when the refined
    # CR solve's true relative residual exceeds this, the Newton solve
    # re-runs with the scan factorization inside a lax.cond.  In float32
    # at cond(K) ~ 1e7 the CR Schur updates cancel catastrophically on
    # specific active-set configurations (O(1/mu) blocks, O(1)
    # complement) at ANY depth, while the scan degrades gracefully —
    # measured along the real LISWET level-704 trajectory (RESULTS.md
    # round 4).  The gate costs one O(nnz) matvec the refinement already
    # pays; the scan branch executes only on the rare cancellation step.
    banded_cr_fallback_rtol: float = 1e-3
    # Symmetric Jacobi equilibration of the banded KKT factorization:
    # factor S K S (S = diag(K)^{-1/2}, computed in the state dtype
    # before the kkt_dtype downcast) and unscale the direction.  On
    # aggressive mu schedules cond(K) ~ 1/mu_min is dominated by diagonal
    # scale disparity, which puts float32 refinement exactly at its
    # convergence boundary (cond*eps32 ~ 1 — the round-4 on-TPU ladder
    # failures at n>=5625); the scaled system's diagonal is exactly 1.
    # O(n) per assembly.  Off reproduces the raw-K factorization.
    banded_jacobi_scale: bool = True
    # Refinement mode of the banded direct solve: > 0 = state-dtype PCG
    # on the true system preconditioned by the reduced-precision factor
    # (max Krylov iterations; early exit at rtol 1e-9 f64 / 1e-5 f32).
    # At cond(K) ~ 1/mu_min the f32 factor floors at ~5e-2 direction
    # error and Richardson refinement cannot contract (cond*eps32 > 1);
    # Krylov deflates the outlier modes and restores ~state-eps
    # directions (the round-4 LISWET-tail fix).  0 = the legacy
    # monotone-safeguarded Richardson sweeps (refine_steps).
    banded_pcg_refine: int = 32
    # State-dtype escalation of the banded direct solve: when the
    # refined direction's relative residual exceeds this gate (or is
    # NaN), re-factor in the STATE dtype — native Cholesky on CPU, the
    # hand-rolled unrolled scan (_banded_factor_scan_hr) elsewhere, so
    # it runs on the TPU where jnp.linalg.cholesky f64 crashes the
    # device.  This is the regime where a reduced-precision factor
    # mathematically cannot exist: cond(S K S) > 1/eps(kkt_dtype), i.e.
    # mu below ~1e-7 with float32 factors — exactly the reference's
    # routine operating point (f64 LDL' at mu_min=1e-9, constants.h:55,
    # cholmod_interface.c:8-30).  Without it the NaN factor collapses
    # the direction to the zero-guard and the dual update staircases at
    # rp/mu per step (the round-4 LISWET mu_min<=1e-8 explosion,
    # logs/liswet5625_isolate_mu1e9.log).  0 disables (batched banded
    # fleets: under vmap the cond lowers to a select and both paths
    # execute — disable there if measured).  Engaged only when
    # kkt_dtype is reduced below the state dtype.  The default 1e-6
    # sits well above the healthy f32+PCG path's achieved residual
    # (~1e-9 at its rel-tol) and well below garbage — it fires on
    # NaN/stagnation, never on solves the reduced factor carries fine.
    banded_escalate_rtol: float = 1e-6
    # STATIC gating of the two banded robustness branches above (the CR
    # scan-fallback and the state-dtype escalation): when True (default)
    # each branch is compiled into the program ONLY in the regime where
    # its failure mode can exist — a reduced-precision factor AND a mu
    # floor below the branch's breakdown threshold (mu_min < 1e-6 for
    # the CR cancellation class, measured at cond ~ 1e7; mu_min < 1e-7
    # for f32-factor nonexistence, where cond > 1/eps32).  Both inputs
    # are static settings, so the decision is made at trace time:
    # batched fleets at sane mu floors stop paying the vmap select tax
    # (+35%/batch measured, RESULTS.md) for branches that cannot fire —
    # the reference pays for robustness once (f64 LDL' always,
    # cholmod_interface.c:8-30); this pays only where the regime demands
    # it.  Mirrors the dense kkt_pcg_refine=-1 auto rule.  False
    # restores the always-compiled dynamic gates (the rtol settings
    # alone decide).
    robust_gate_auto: bool = True
    # Dense-path Newton solver: "chol" = masked-matmul K formation +
    # Jacobi-prescaled batched Cholesky + triangular solves (the direct
    # path mirroring the reference's factorize+solve,
    # cholmod_interface.c:8-30/98-102).  "cg" = FACTORIZATION-FREE: form
    # K once per Newton iteration (one MXU GEMM) and solve by
    # Jacobi-preconditioned CG on the materialized K — one memory-bound
    # (B,n,n)@(B,n) matvec per CG iteration — warm-started from the
    # previous direction with Eisenstat-Walker forcing from eps_in.
    # Motivation (round-5 probes): lax.linalg's batched
    # Cholesky/trisolves lower to ~n sequential steps and sustain 0.02
    # TFLOPS at (B=256, n=100), ~5 of the 5.3 ms bench iteration, while
    # the GEMM/matvec path rides the MXU/HBM at full rate.  Directions
    # are inexact (newton_exact=False, full-step acceptance off);
    # accuracy is carried by the forcing term + state-dtype refinement
    # (cg_refine_rounds) exactly as on the sparse CG path.
    # "inv" = ANCHORED EXPLICIT INVERSE: every anchor_every iterations
    # (run_loop's nested refresh — the amortized analogue of the
    # reference's periodic refactorization, newton.c:21-24) compute
    # X = K^{-1} once via Cholesky + one matrix-RHS triangular solve +
    # one GEMM; every Newton step forms the CURRENT K (one GEMM) and
    # runs kkt_cg_fixed CG iterations preconditioned by X (one GEMM
    # apply per iteration, zero triangular solves in the hot loop).
    # Exactness never depends on X's staleness — X only preconditions.
    # "ns" = NEWTON-SCHULZ-TRACKED inverse: a fixed count of large MXU
    # ops per Newton step and NO inner loop — form the current K (one
    # GEMM), damp X by the measured spectral bound of KX (mu shrinks
    # would otherwise blow the NS iteration up), run kkt_ns_steps
    # Newton-Schulz updates X <- X(2I - KX) (2 GEMMs each, error
    # squares), apply dx = X rhs + one monotone Richardson correction,
    # resymmetrize; the anchor-cadence exact rebuild bounds drift.  The
    # TPU-optimal mode when per-kernel launch latency dominates (the
    # round-5 probe cost model): ~5 GEMMs + 3 GEMVs per iteration.
    kkt_solver: str = "chol"
    # Newton-Schulz updates per Newton step in kkt_solver="ns" (2 GEMMs
    # each; error contracts quadratically per step once damped).
    kkt_ns_steps: int = 2
    # Periodic exact rebuild of the inv/ns inverse cache at the anchor
    # cadence (run_loop's nested refresh).  False = init-only: the NS
    # tracking carries X alone — measured iteration-NEUTRAL-or-better on
    # the bench batch (ns5: 48.3 iters untracked vs 54.5 refreshed vs
    # 56.9 direct) while keeping lax.linalg (0.02 TFLOPS on TPU) out of
    # the loop entirely; the damping guard + Jacobi NaN fallback bound
    # divergence.  "inv" (X as PCG preconditioner) keeps True: its CG
    # count grows with staleness.
    kkt_inv_refresh: bool = True
    # Fixed CG trip count for kkt_solver="cg" when the state dtype
    # equals the KKT dtype (the f32 warmup phase): run EXACTLY this many
    # warm-started CG iterations per Newton step via fori_loop — no
    # convergence predicate, no residual reductions.  0 = use the
    # early-exit while_loop PCG (measured 4.2x slower than the direct
    # path at the bench shape: the per-iteration convergence test costs
    # more than the matvec).  Accuracy control is the caller's
    # inexact-Newton machinery (warm start + monotone linesearch).
    kkt_cg_fixed: int = 0
    # Dense-path analogue of banded_pcg_refine: PCG refinement of the
    # dense Newton solve, preconditioned by the kkt_dtype Cholesky, with
    # exact state-dtype matvecs.  -1 = AUTO: engage (32 iterations) only
    # when kkt_dtype is reduced AND mu_min < 1e-7 — exactly the regime
    # where the f32 factor floors at O(1e-2) direction error and the
    # Richardson sweeps (refine_steps) cannot contract; everywhere else
    # the cheap Richardson path is untouched (the bench hot loop never
    # pays).  0 = off; > 0 = force that iteration cap.  This makes
    # kkt_dtype="float32" safe at the reference's own mu_min=1e-9
    # default (constants.h:55) on the dense path.
    kkt_pcg_refine: int = -1
    # Dense analogue of banded_escalate_rtol: when the kkt_pcg_refine
    # PCG stagnates or NaNs (the f32 factor cannot exist beyond
    # cond ~ 1/eps32 — below mu ~ 1e-8 the dense path showed the same
    # dual staircase as the banded one, rd 2.4e+20 at mu_min=1e-9,
    # logs/dense_mu1e9_probe.log), re-factor in the STATE dtype: native
    # Cholesky on CPU, fori-loop Cholesky/substitutions on TPU (no
    # lax.linalg / no MXU dots, so f64 emulation carries it).  Lives
    # inside the pcg_refine branch only — programs with pcg_refine=0
    # (the bench configs at mu_min=1e-7) never contain it.
    kkt_escalate_rtol: float = 1e-6
    # Two-level preconditioning: add a coarse-grid correction
    # (piecewise-constant aggregates of precond_block columns, dense
    # coarse factor) on top of block-Jacobi — removes the low-frequency
    # modes that make CG counts grow with n on PDE/banded KKT systems.
    precond_two_level: bool = True
    # --- Pallas in-loop kernels (dense path; SURVEY §7 step 4's "swap
    # under the same signatures" clause).  Both default off: the kernels
    # won 2-10% STANDALONE on the 2026-08-19 chip state (RESULTS.md) and
    # these flags exist to measure them IN-LOOP (bench A/B) — adopt where
    # the measurement says so.  On TPU they engage only when the compute
    # dtype is float32 (Pallas TPU has no f64); on CPU they run in
    # interpret mode (tests).
    # Fused KKT formation: K = A'(w∘A) + Q + sigma*I in one kernel — the
    # (m, n) row-scaled intermediate never reaches HBM
    # (ops/pallas_formation.py).
    pallas_formation: bool = False
    # Fused residual+norm block: the whole per-iteration residual
    # computation (outer/inner residuals, w, active, 4 norms) in one
    # launch (ops/pallas_residuals.py).
    pallas_residuals: bool = False
    # Dense path: run the ENTIRE Newton solve (KKT formation + Jacobi
    # scaling + Cholesky + both substitutions) as one Pallas kernel per
    # batch (ops/pallas_kkt.py fused_kkt_solve) instead of XLA's
    # formation GEMM + many-kernel blocked Cholesky + two triangular
    # solves.  Targets launch/latency-bound chip states (the round-4
    # corrected probes: honest MFU 3% on a 4.3 TFLOPS part).  float32
    # internally; engages only when the formation dtype is float32 on
    # device (interpret mode on CPU).  Refinement sweeps re-invoke the
    # kernel (a refactorization each) — pair with refine_steps 0.
    pallas_kkt: bool = False
    # Crash-resilient segmented driving (host-chunked paths only, i.e.
    # when max_time/verbose route through solve_driven): number of
    # device/worker-crash recoveries to attempt.  Each completed chunk's
    # state is snapshotted to host memory (<5% overhead at the ~20 s
    # adaptive chunk target); on a crash the driver waits for the
    # backend, restores operator+state from the snapshots, and resumes
    # with one recompile.  Built for the platform fault class of
    # RESULTS.md (sustained sparse-CG streams killing the worker).
    # 0 disables (a crash propagates as before).
    crash_recovery: int = 2
    # Fold the Newton rhs matvec A'ytilde into the KKT formation GEMM as
    # one extra operand column:  A' @ [w∘A | ytilde]  — one MXU dispatch
    # instead of two (dense direct path only).  Op-COUNT cuts are the
    # measured throughput lever on MXU-op-rate-bound chip states
    # (RESULTS.md round 3); same error class as the separate matvec
    # (A'ytilde already ran in the KKT dtype).  Off by default pending
    # the bench A/B; trajectories differ only by summation order.
    fused_newton_rhs: bool = False
    # Matmul precision for the float32 warmup phase only (it targets
    # warmup_eps ~ 1e-3, so "tensorfloat32" 3-pass arithmetic can be a
    # faster choice than "highest" on TPU).
    warmup_matmul_precision: str = "highest"
    # Full-Newton-step acceptance ("active-set jump", no reference
    # equivalent).  After the exact linesearch, also evaluate the inner
    # residual at the full step tau=1 — zero extra GEMMs, every cache
    # increment (Adx, Qdx, Atdy) is already in hand — and take tau=1 when
    # it shrinks the inner residual norm by ``full_step_gamma``.  The
    # reference's exact linesearch (linesearch.c:8-69) crawls on chained
    # one-sided constraints (LISWET-style): the merit root lands on the
    # first hinge breakpoint, so each factorization activates ONE
    # constraint.  An accepted full step re-estimates the active set from
    # the full-step w, flipping many rows at once (primal-dual active-set
    # behaviour); rejected steps fall back to the exact linesearch, so
    # merit-descent globalization is preserved.  Set False for exact
    # reference stepping semantics.
    newton_full_step: bool = True
    full_step_gamma: float = 0.9
    # Incremental KKT formation (dense path; the TPU re-design of the
    # reference's rank-k factor updates, newton.c:21-33 +
    # cholmod_interface.c:57-93).  Forming K = Q + sigma I + A'WA is
    # ~80% of the per-iteration FLOPs (2mn^2), but after the first few
    # iterations W = active/mu changes on only a handful of rows.  With
    # kkt_update_rows = k > 0 the solver carries K-tilde = Q + A'W~A in
    # the state and updates it with the top-k |dW| rows per iteration
    # (2kn^2); the factorization uses K-tilde while iterative refinement
    # computes residuals against the EXACT K (w-exact matvecs), so the
    # Newton direction stays accurate whenever the un-applied dW mass is
    # small — and degrades gracefully (refinement's monotone safeguard +
    # the exact linesearch keep merit descent) when it spikes after a mu
    # update.  A full rebuild happens every ``anchor_every`` iterations
    # (chunk cadence shared with the mixed-GEMM anchors).  0 = off
    # (re-form K every iteration, round-1/2 behaviour).
    kkt_update_rows: int = 0
    # Solution polish (dense path; no reference equivalent — OSQP-style).
    # Identify the active set from the current iterate (the mu -> 0 limit
    # of the activity test, newton.c:96-107) and solve the
    # equality-constrained KKT saddle system on it exactly
    # (ops/linalg.saddle_polish_solve: LU in kkt_dtype + state-dtype
    # refinement; measured residuals ~1e-14 when the set is right).  The
    # polished point is accepted per problem only if its *recomputed* outer
    # residuals meet eps_abs (and, for already-solved problems, improve) —
    # a wrong active-set guess is rejected and the iterate is untouched.
    # Fired (a) right after the hybrid float32 warmup, where a successful
    # polish skips the accurate phase entirely (~97% success from a 1e-4
    # warm point on the bench family), (b) after the main loop, where it
    # sharpens solved iterates and can rescue MAX_ITER stragglers, and
    # (c) before the loop on fully-warm solves (x0 and y0 given), where an
    # unchanged active set finishes the MPC re-solve in zero iterations.
    polish: bool = False
    # Dual regularization of the polish saddle system (handles
    # duplicated/dependent active rows).
    polish_delta: float = 1e-8
    # State-dtype refinement rounds on the polish solve.
    polish_refine: int = 2
    # Inertial (heavy-ball) extrapolation of the proximal center, opt-in
    # (no reference equivalent; the reference always recenters at the
    # iterate, qpdo.c:396-397).  At an outer boundary the center becomes
    #     center <- z + gamma_k (z - center_old),   z = (x, y)
    # with gamma_k = accel_gamma * oter/(oter + 3) (a Nesterov-style ramp),
    # safeguarded per problem: extrapolation only fires when the subproblem
    # converged before its iteration cap AND the outer primal residual
    # decreased vs. the previous boundary — otherwise the plain reference
    # recenter is used, so merit-descent globalization is preserved.
    # Infeasibility certificates remain sound: the Farkas tests
    # (termination.c:97-216) validate the direction y - ybar itself,
    # whatever produced it.  0.0 = off (reference semantics).
    accel_gamma: float = 0.0
    # Matmul precision for every dot/matvec in the solver.  TPUs default to
    # bfloat16 passes for float32 matmuls, which silently destroys the
    # residual accuracy the tolerances rely on; "highest" forces full
    # float32 (6-pass) arithmetic.  ("tensorfloat32" = 3-pass is a faster,
    # slightly less safe option.)
    matmul_precision: str = "highest"

    def replace(self, **kw) -> "Settings":
        return dataclasses.replace(self, **kw)


class Scaling(NamedTuple):
    """Ruiz equilibration state (reference: QPDOScaling, include/types.h:40-47).

    Identity vectors when scaling is disabled, so downstream formulas are
    branch-free.
    """

    D: jax.Array     # (n,) primal scaling
    Dinv: jax.Array  # (n,)
    E: jax.Array     # (m,) dual scaling
    Einv: jax.Array  # (m,)
    c: jax.Array     # scalar cost scaling
    cinv: jax.Array  # scalar


class ScaledProblem(NamedTuple):
    """Scaled problem data + scaling + static bound-finiteness masks.

    ``l_finite``/``u_finite`` are {0,1} float masks computed from the raw
    bounds; the reference recovers them on the fly as ``u < E*QPDO_INFTY``
    (src/termination.c:131-138).
    """

    data: Problem          # scaled: Q<-cDQD, q<-cDq, A<-EAD, l/u<-E*l/u
    scaling: Scaling
    l_finite: jax.Array    # (m,) 1.0 where l > -inf
    u_finite: jax.Array    # (m,) 1.0 where u < +inf
    norm_q: jax.Array      # scalar, ||Dinv*q_scaled||_inf (reference qpdo.c:163-169)


class SolverState(NamedTuple):
    """Loop-carried iterate (scaled space). All scalars are 0-d arrays."""

    x: jax.Array             # (n,) primal iterate
    y: jax.Array             # (m,) dual iterate
    Qx: jax.Array            # (n,) cached Q @ x (pure, without sigma*x)
    Ax: jax.Array            # (m,) cached A @ x
    Aty: jax.Array           # (n,) cached A' @ y
    dx_prev: jax.Array       # (n,) previous Newton direction (warm-starts
                             # the CG solve on the sparse path; inert on
                             # factorization paths)
    xbar: jax.Array          # (n,) proximal center, primal
    ybar: jax.Array          # (m,) proximal center, dual
    mu: jax.Array            # (m,) per-constraint penalty vector
    sigma: jax.Array         # scalar primal regularization
    eps_in: jax.Array        # scalar inner tolerance
    res_prim_old: jax.Array  # (m,) outer primal residual at last prox update
    tau: jax.Array           # scalar last linesearch stepsize
    iter: jax.Array          # i32 total iteration counter
    iter_old: jax.Array      # i32 iteration at which last subproblem finished
    oter: jax.Array          # i32 outer (prox) iteration counter
    status: jax.Array        # i32 status code; UNSOLVED while running
    # diagnostics carried for Info (unscaled norms)
    res_prim_norm: jax.Array
    res_dual_norm: jax.Array
    res_prim_in_norm: jax.Array
    res_dual_in_norm: jax.Array
    # incremental-KKT cache (Settings.kkt_update_rows > 0, dense path):
    # (K_tilde, w_applied) with K_tilde = Q + A' diag(w_applied) A in the
    # KKT dtype; None when the feature is off or unsupported
    kkt_cache: object = None
    # i32 iteration count at the hybrid-warmup phase boundary (0 when
    # hybrid_warmup is off) — lets per-phase FLOP accounting split the
    # cheap float32 warmup iterations from the accurate-phase ones
    warmup_iter: jax.Array = None


class Info(NamedTuple):
    """Solve diagnostics (reference: QPDOInfo, include/types.h:53-72)."""

    iterations: jax.Array        # i32
    oterations: jax.Array        # i32
    status_val: jax.Array        # i32
    res_prim_norm: jax.Array
    res_dual_norm: jax.Array
    res_prim_in_norm: jax.Array
    res_dual_in_norm: jax.Array
    objective: jax.Array
    setup_time: jax.Array        # seconds; filled by the stateful API
    solve_time: jax.Array
    run_time: jax.Array
    # i32 iterations spent in the float32 hybrid-warmup phase (<= iterations;
    # 0 when hybrid_warmup is off).  TPU extension: feeds per-phase FLOP/MFU
    # accounting (the warmup skips certificate GEMMs and runs refine_steps=1)
    warmup_iterations: jax.Array = None

    @property
    def status(self):
        """Status string (host-side only; requires a concrete status_val)."""
        return _c.STATUS_STRINGS.get(int(self.status_val), "unrecognised status value")


class Result(NamedTuple):
    """Solve output, mirroring the 5-output MEX contract
    (interfaces/mex/qpdo_mex.c:227-281): x, y, primal/dual infeasibility
    certificates (NaN-filled according to status), and Info."""

    x: jax.Array              # (n,)
    y: jax.Array              # (m,)
    prim_inf_cert: jax.Array  # (m,) dy, valid iff status == PRIMAL_INFEASIBLE
    dual_inf_cert: jax.Array  # (n,) dx, valid iff status == DUAL_INFEASIBLE
    info: Info
