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


def kkt_inverse(Q, A, active, mu, sigma, proximal: bool, kkt_dtype=None):
    """Explicit K^{-1} for the anchored-inverse Newton mode
    (Settings.kkt_solver="inv"): Jacobi-prescaled Cholesky + ONE
    matrix-RHS triangular solve + one GEMM.

    Built at ANCHOR cadence only (run_loop's nested refresh, every
    anchor_every iterations — the amortized analogue of the reference's
    periodic full refactorization, newton.c:21-24); between anchors the
    returned X serves as the CG preconditioner over the CURRENT K, so
    correctness never depends on staleness.  The matrix-RHS trisolve
    costs the same sequential depth as the vector one but n-fold wider
    work per step, which the TPU absorbs — this is the whole point of
    applying the factor once per anchor instead of twice per iteration."""
    dt = Q.dtype
    kdt = jnp.dtype(kkt_dtype) if kkt_dtype is not None else dt
    K = form_kkt(Q.astype(kdt), A.astype(kdt), active.astype(kdt),
                 mu.astype(kdt), jnp.asarray(sigma, kdt), proximal)
    chol, dinv = jacobi_cholesky(K)
    n = K.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=kdt), K.shape)
    Linv = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
    Xhat = jnp.einsum("...ji,...jk->...ik", Linv, Linv)  # L^-T L^-1
    return Xhat * dinv[..., :, None] * dinv[..., None, :]


def _prescaled_tri_solver(chol, dinv, out_dtype):
    """b -> D^-1 (LL')^-1 D^-1 b for a Jacobi-prescaled factor: the one
    reduced-precision triangular-solve pair shared by the direct and
    incremental Newton solvers."""
    kdt = chol.dtype

    def solve1(b):
        bh = (b * dinv).astype(kdt)
        z = jax.scipy.linalg.solve_triangular(chol, bh, lower=True)
        z = jax.scipy.linalg.solve_triangular(chol, z, lower=True, trans=1)
        return z.astype(out_dtype) * dinv.astype(out_dtype)

    return solve1


def _chol_fori(K):
    """Cholesky of (..., n, n) SPD matrices via a ``lax.fori_loop`` of
    masked column updates — no ``lax.linalg`` and no dot_general, only
    elementwise multiply + reduce, so it runs in float64 on the TPU
    (where ``jnp.linalg.cholesky`` f64 crashes the device and the MXU
    has no f64 path).  O(n^3) elementwise work in n loop steps; the
    dense state-dtype escalation path only (gate-failure systems)."""
    n = K.shape[-1]
    idx = jnp.arange(n)

    def body(j, L):
        Lj = jnp.take(L, j, axis=-2)                       # row j (..., n)
        kmask = (idx < j).astype(K.dtype)
        S = jnp.sum(L * (Lj * kmask)[..., None, :], axis=-1)
        v = jnp.take(K, j, axis=-1) - S                    # column j
        pivot = jnp.sqrt(jnp.take(v, j, axis=-1))
        col = v / pivot[..., None]
        col = jnp.where(idx >= j, col, jnp.zeros_like(col))
        return jax.lax.dynamic_update_index_in_dim(L, col, j, -1)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(K))


def _tri_solve_fori(L, r, trans=False):
    """Substitution solve of L x = r (or L' x = r) for (..., n, n) lower
    L and (..., n) r via ``lax.fori_loop`` — companion of ``_chol_fori``
    (same no-lax.linalg constraint)."""
    n = L.shape[-1]
    idx = jnp.arange(n)

    def fwd(i, x):
        Li = jnp.take(L, i, axis=-2)                       # row i
        s = jnp.sum(Li * (idx < i).astype(r.dtype) * x, axis=-1)
        xi = (jnp.take(r, i, axis=-1) - s) / jnp.take(Li, i, axis=-1)
        return jax.lax.dynamic_update_index_in_dim(x, xi, i, -1)

    def bwd(k, x):
        i = n - 1 - k
        Lci = jnp.take(L, i, axis=-1)                      # column i = L'[i,:]
        s = jnp.sum(Lci * (idx > i).astype(r.dtype) * x, axis=-1)
        xi = (jnp.take(r, i, axis=-1) - s) / jnp.take(Lci, i, axis=-1)
        return jax.lax.dynamic_update_index_in_dim(x, xi, i, -1)

    return jax.lax.fori_loop(0, n, bwd if trans else fwd,
                             jnp.zeros_like(r))


def _state_dtype_kkt_solver(Q, A, active, mu, sigma, proximal: bool):
    """b -> K^{-1} b with the FACTOR in the state dtype — the dense
    analogue of the banded state-dtype escalation: below mu ~ 1e-8 the
    float32 KKT factor mathematically cannot exist (spectral
    cond > 1/eps32 — measured NaN on the real LISWET assembly), so the
    preconditioner the PCG refinement rests on is NaN and the direction
    collapses to the zero-guard (the dual-staircase class,
    logs/dense_mu1e9_probe.log: rd 2.4e+20 at mu_min=1e-9 pre-fix).
    Native Cholesky on CPU; the fori-loop variants elsewhere (TPU f64
    Cholesky is a device-crash path).  Jacobi-prescaled like the fast
    path."""
    dt = Q.dtype
    K = form_kkt(Q, A, active, mu, jnp.asarray(sigma, dt), proximal)
    d = jnp.sqrt(jnp.diagonal(K, axis1=-2, axis2=-1))
    d = jnp.where(d > 0, d, 1.0)
    dinv = 1.0 / d
    Khat = K * dinv[..., :, None] * dinv[..., None, :]
    if jax.default_backend() == "cpu":
        L = jnp.linalg.cholesky(Khat)

        def solve(b):
            z = jax.scipy.linalg.solve_triangular(
                L, (b * dinv)[..., None], lower=True)
            z = jax.scipy.linalg.solve_triangular(
                L, z, lower=True, trans=1)[..., 0]
            return z * dinv
    else:
        L = _chol_fori(Khat)

        def solve(b):
            z = _tri_solve_fori(L, b * dinv)
            z = _tri_solve_fori(L, z, trans=True)
            return z * dinv

    return solve


def _exact_kmv(Q, A, w, sigma, proximal: bool, kdt, dt):
    """v -> K(w) v with O(n^2+mn) matvecs in the KKT dtype: they only
    bound dx's accuracy at ~eps(kdt) relative, which is enough —
    convergence is gated by the state-dtype residuals, not by dx's last
    bits.  Keeps all refinement/PCG work off the emulated-f64 path on
    TPU.  Shared by the direct (refinement) and incremental (PCG)
    solvers."""
    Qk, Ak, wk = Q.astype(kdt), A.astype(kdt), w.astype(kdt)

    def Kmv(v):
        vk = v.astype(kdt)
        Kv = (Qk @ vk + Ak.T @ (wk * (Ak @ vk))).astype(dt)
        if proximal:
            Kv = Kv + sigma * v
        return Kv

    return Kmv


def newton_system_solve(Q, A, active, mu, sigma, rhs, proximal: bool,
                        refine_steps: int = 0, kkt_dtype=None,
                        pallas_formation: bool = False,
                        ytilde=None, res_dual_in=None,
                        pcg_refine: int = 0,
                        pallas_kkt: bool = False,
                        escalate_rtol: float = 0.0):
    """Form K and solve K dx = rhs (the factorization event of newton.c:21-49).

    With ``kkt_dtype`` set (e.g. float32 while the state is float64), the
    O(mn^2) formation and O(n^3) factorization run in reduced precision on
    the MXU, and each refinement sweep computes the residual with *exact*
    full-precision matvecs  K dx = Q dx + sigma dx + A'(w .* (A dx))  —
    O(n^2 + mn) — so the solution converges to state-dtype accuracy as long
    as cond(K)*eps(kkt_dtype) < 1.

    ``pallas_formation`` swaps the formation for the fused Pallas kernel
    (ops/pallas_formation.py — the row-scaled (m, n) intermediate never
    reaches HBM); engaged only when the formation dtype is float32
    (Pallas TPU has no f64), interpret mode on CPU.

    FUSED-RHS MODE (``ytilde``/``res_dual_in`` given, ``rhs`` ignored):
    the rhs matvec A'ytilde rides the formation GEMM as one extra
    column,  A' @ [w∘A | ytilde]  →  (n, n+1)  — one MXU op instead of
    two.  Op-COUNT cuts are the throughput lever on MXU-op-rate-bound
    chip states (RESULTS.md round 3: kkt_update_rows=16 cut FLOPs 2.5x
    at equal wall; Settings.fused_newton_rhs).  Numerically identical
    error class: the old path also ran A'ytilde in the KKT dtype.
    """
    dt = Q.dtype
    kdt = jnp.dtype(kkt_dtype) if kkt_dtype is not None else dt
    w = active / mu
    on_cpu = jax.default_backend() == "cpu"
    fused_rhs = ytilde is not None
    if pallas_kkt and (on_cpu or kdt == jnp.dtype(jnp.float32)):
        # THE WHOLE NEWTON SOLVE AS ONE KERNEL (ops/pallas_kkt.py):
        # formation + Jacobi scaling + Cholesky + both substitutions in
        # VMEM — replaces XLA's formation GEMM, its many-kernel blocked
        # Cholesky, and two triangular solves with a single launch per
        # batch.  The round-4 corrected peak probes showed the bench
        # iteration is launch/latency-bound (honest MFU 3% on a 4.3
        # TFLOPS chip state), which is exactly the regime this kernel
        # targets.  f32 internally (TPU Pallas has no f64); refinement
        # below re-invokes the kernel (a refactorization per sweep —
        # use refine_steps 0 and let the caller's PCG/Richardson run
        # only where needed).
        from .pallas_kkt import fused_kkt_solve
        if fused_rhs:
            rhs = -(res_dual_in
                    + (A.T.astype(kdt) @ ytilde.astype(kdt)).astype(dt))
        sig_eff = jnp.asarray(sigma, jnp.float32) if proximal \
            else jnp.zeros((), jnp.float32)

        def ksolve(r):
            return fused_kkt_solve(
                Q[None], A[None], w[None], sig_eff[None],
                r.astype(jnp.float32)[None],
                interpret=on_cpu)[0].astype(dt)

        dx = ksolve(rhs)
        if pcg_refine > 0:
            from .cg import pcg

            def Kmv_exact(v):
                Kv = Q @ v + A.T @ (w * (A @ v))
                if proximal:
                    Kv = Kv + sigma * v
                return Kv

            tol = 1e-9 if dt == jnp.dtype(jnp.float64) else 1e-5
            dx, _, _ = pcg(Kmv_exact, rhs, ksolve, tol, pcg_refine)
        elif refine_steps > 0:
            Kmv = _exact_kmv(Q, A, w, sigma, proximal, kdt, dt)
            r = rhs - Kmv(dx)
            for _ in range(refine_steps):
                dx_new = dx + ksolve(r)
                r_new = rhs - Kmv(dx_new)
                better = jnp.linalg.norm(r_new) < jnp.linalg.norm(r)
                dx = jnp.where(better, dx_new, dx)
                r = jnp.where(better, r_new, r)
        finite = jnp.all(jnp.isfinite(dx))
        return jnp.where(finite, dx, jnp.zeros_like(dx))
    if fused_rhs and not pallas_formation:
        Ak = A.astype(kdt)
        AwY = jnp.concatenate(
            [w.astype(kdt)[..., :, None] * Ak,
             ytilde.astype(kdt)[..., :, None]], axis=-1)   # (m, n+1)
        G = Ak.T @ AwY if Ak.ndim == 2 else jnp.einsum(
            "...mn,...mk->...nk", Ak, AwY)
        n = Q.shape[-1]
        K = Q.astype(kdt) + G[..., :n]
        if proximal:
            K = K + jnp.asarray(sigma, kdt) * jnp.eye(n, dtype=kdt)
        rhs = -(res_dual_in + G[..., n].astype(dt))
    elif pallas_formation and (on_cpu or kdt == jnp.dtype(jnp.float32)):
        from .pallas_formation import fused_formation
        if fused_rhs:  # pallas kernel has no rhs column; compute apart
            rhs = -(res_dual_in
                    + (A.T.astype(kdt) @ ytilde.astype(kdt)).astype(dt))
        sig_eff = jnp.asarray(sigma, kdt) if proximal \
            else jnp.zeros((), kdt)
        K = fused_formation(A.astype(kdt)[None], w.astype(kdt)[None],
                            Q.astype(kdt)[None], sig_eff[None],
                            interpret=on_cpu)[0]
    else:
        if fused_rhs:
            rhs = -(res_dual_in
                    + (A.T.astype(kdt) @ ytilde.astype(kdt)).astype(dt))
        K = form_kkt(Q.astype(kdt), A.astype(kdt),
                     active.astype(kdt), mu.astype(kdt),
                     jnp.asarray(sigma, kdt), proximal)
    chol, dinv = jacobi_cholesky(K)
    solve1 = _prescaled_tri_solver(chol, dinv, dt)
    Kmv = _exact_kmv(Q, A, w, sigma, proximal, kdt, dt)

    if pcg_refine > 0:
        # PCG refinement preconditioned by the reduced-precision factor,
        # with TRUE state-dtype matvecs: at cond(K) ~ 1/mu beyond ~1e7
        # the f32 factor's direction error floors at O(1e-2) and the
        # Richardson sweeps below cannot contract (cond*eps(kdt) > 1);
        # Krylov deflates the outlier modes and restores state-eps
        # directions (the round-4 banded-path fix applied to the dense
        # path; engaged via Settings.kkt_pcg_refine — auto when
        # kkt_dtype is reduced AND mu_min < 1e-7, i.e. exactly the
        # regime the reference's f64 LDL' handles at its mu_min=1e-9
        # default, constants.h:55).
        from .cg import pcg

        def Kmv_exact(v):
            Kv = Q @ v + A.T @ (w * (A @ v))
            if proximal:
                Kv = Kv + sigma * v
            return Kv

        tol = 1e-9 if dt == jnp.dtype(jnp.float64) else 1e-5
        dx, _, rel = pcg(Kmv_exact, rhs, solve1, tol, pcg_refine)

        # STATE-DTYPE ESCALATION (Settings.kkt_escalate_rtol), the dense
        # analogue of the banded gate: when the PCG residual stagnates or
        # NaNs (the f32 factor cannot exist beyond cond ~ 1/eps32 — the
        # mu <= 1e-8 dual-staircase class), re-factor in the state dtype
        # inside a lax.cond.  Never engaged in programs with
        # pcg_refine == 0 (e.g. the bench configs at mu_min = 1e-7).
        if escalate_rtol > 0 and kdt != dt:
            esc_ok = rel <= escalate_rtol        # False on NaN

            def exact_path(_):
                solve64 = _state_dtype_kkt_solver(
                    Q, A, active, mu, sigma, proximal)
                dx2 = solve64(rhs)
                return dx2 + solve64(rhs - Kmv_exact(dx2))

            dx = jax.lax.cond(esc_ok, lambda _: dx, exact_path, None)
        finite = jnp.all(jnp.isfinite(dx))
        return jnp.where(finite, dx, jnp.zeros_like(dx))

    def resid(v):
        return rhs - Kmv(v)

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


def saddle_polish_solve(Q, A, q, act, bnd, delta, refine_steps: int = 2,
                        lu_dtype=None):
    """Solve the equality-constrained KKT (saddle) system on the identified
    active set — the solution-polish step (Settings.polish; the OSQP-style
    refinement the reference lacks, its accuracy story being iterating to
    eps_abs, qpdo.c:343-449).

    Static shapes: instead of gathering active rows, inactive rows carry the
    trivial equation y_i = 0, so the system is always (n+m, n+m):

        S = [[Q,       (act*A)'                  ],      rhs = [-q      ]
             [act*A,   diag(-delta*act + (1-act))]]            [act*bnd ]

    For active rows the second block enforces (A x)_i = bnd_i (with a tiny
    -delta dual regularization for duplicated/dependent rows); for inactive
    rows it enforces y_i = 0.  The penalty form (Q + A'WA with W = act/mu_p)
    is NOT used: its residual floor is eps * ||W|| * ||x|| ~ 1e-6 at
    mu_p = 1e-8 — the saddle form is perfectly conditioned (measured
    cond ~ 1e2 on the bench problems) and reaches ~1e-14.

    LU-factor in ``lu_dtype`` (e.g. float32 on TPU), refine with exact
    state-dtype matvecs.  Returns ``(xp, yp)``; a non-finite solve returns
    the zero vector (the caller's acceptance test rejects it).
    """
    xp, yp = saddle_solve(Q, A, act, -q, act * bnd, delta, refine_steps,
                          lu_dtype)
    return xp, yp * act


def saddle_solve(Q, A, act, rhs1, rhs2, delta, refine_steps: int = 2,
                 lu_dtype=None):
    """Solve the (symmetric, indefinite) active-set saddle system

        [[Q,       (act*A)'                  ]]  [v1]   [rhs1]
        [[act*A,   diag(-delta*act + (1-act))]]  [v2] = [rhs2]

    by LU in ``lu_dtype`` + state-dtype iterative refinement.  Shared by the
    solution polish (rhs = KKT data) and the differentiable layer's
    forward/adjoint sensitivity systems (rhs = tangents / cotangents —
    the system matrix is the same in all three roles, and symmetric, so
    the adjoint solve reuses it verbatim).  Returns ``(v1, v2)``; v2 of
    inactive rows solves the trivial equation v2_i = rhs2_i."""
    dt = Q.dtype
    ldt = jnp.dtype(lu_dtype) if lu_dtype is not None else dt
    n = Q.shape[-1]
    Aact = act[:, None] * A
    dblock = (1.0 - act) - jnp.asarray(delta, dt) * act
    top = jnp.concatenate([Q, Aact.T], axis=-1)
    bottom = jnp.concatenate(
        [Aact, jnp.diag(dblock).astype(dt)], axis=-1)
    S = jnp.concatenate([top, bottom], axis=-2)
    rhs = jnp.concatenate([rhs1, rhs2])

    lu, piv = jax.scipy.linalg.lu_factor(S.astype(ldt))

    def solve1(b):
        return jax.scipy.linalg.lu_solve((lu, piv), b.astype(ldt)).astype(dt)

    def Smv(v):
        v1, v2 = v[:n], v[n:]
        return jnp.concatenate(
            [Q @ v1 + Aact.T @ v2, Aact @ v1 + dblock * v2])

    sol = solve1(rhs)
    for _ in range(refine_steps):
        sol = sol + solve1(rhs - Smv(sol))
    finite = jnp.all(jnp.isfinite(sol))
    sol = jnp.where(finite, sol, jnp.zeros_like(sol))
    return sol[:n], sol[n:]


# ---------------------------------------------------------------------------
# Incremental KKT formation (Settings.kkt_update_rows)
# ---------------------------------------------------------------------------
# The TPU re-design of the reference's rank-k factor up/downdates
# (newton.c:21-33, cholmod_interface.c:57-93): instead of updating the
# *factor* (sequential, anti-TPU), carry the *matrix*
# K_tilde = Q + A' diag(w_applied) A across iterations and update it with
# the top-k changed rows per iteration (one (k,n)'(k,n) MXU matmul, 2kn^2
# vs the full formation's 2mn^2).  The factorization is of K_tilde;
# iterative refinement computes residuals against the exact
# K(w) = Q + sigma I + A' diag(w) A, so the direction converges to the true
# Newton direction whenever ||K - K_tilde|| is small relative to K_tilde.


def kkt_cache_build(Q, A, w, kkt_dtype=None):
    """Fresh cache: (K_tilde, w_applied) = (Q + A' diag(w) A, w) in the
    KKT dtype.  No sigma term — sigma is applied at factor time (it is a
    scalar that changes independently of W)."""
    kdt = jnp.dtype(kkt_dtype) if kkt_dtype is not None else Q.dtype
    Qk, Ak, wk = Q.astype(kdt), A.astype(kdt), w.astype(kdt)
    return Qk + Ak.T @ (wk[:, None] * Ak), wk


def newton_system_solve_cached(Q, A, w, sigma, rhs, cache, proximal: bool,
                               refine_steps: int, kkt_dtype, k: int):
    """Incremental variant of ``newton_system_solve``: apply the top-k
    |dW| row updates to the cached K_tilde, factor it, and solve the EXACT
    system K(w) dx = rhs by preconditioned CG with the K_tilde factor as
    the preconditioner.  Returns ``(dx, new_cache)``.

    PCG (not Richardson refinement) is what makes staleness safe: when the
    un-applied dW mass is large (many active-set flips or a mu update in
    one iteration), the stationary refinement iteration diverges
    (rho(I - K_tilde^-1 K) > 1) while PCG still contracts the K-norm error
    monotonically for any SPD preconditioner; when K_tilde is fresh it
    converges in 1-2 steps.  Each step costs one exact K matvec (O(n^2+mn))
    plus two triangular solves — far below the 2mn^2 formation this path
    avoids."""
    dt = Q.dtype
    kdt = jnp.dtype(kkt_dtype) if kkt_dtype is not None else dt
    Ktilde, w_app = cache
    k = min(int(k), A.shape[0])

    dw = w.astype(kdt) - w_app
    _, idx = jax.lax.top_k(jnp.abs(dw), k)
    dw_sel = dw[idx]                                   # (k,)
    A_sel = A.astype(kdt)[idx]                         # (k, n)
    Ktilde = Ktilde + A_sel.T @ (dw_sel[:, None] * A_sel)
    w_app = w_app.at[idx].add(dw_sel)

    Kfac = Ktilde
    if proximal:
        n = Q.shape[-1]
        Kfac = Kfac + jnp.asarray(sigma, kdt) * jnp.eye(n, dtype=kdt)
    chol, dinv = jacobi_cholesky(Kfac)
    solve1 = _prescaled_tri_solver(chol, dinv, dt)
    Kmv = _exact_kmv(Q, A, w, sigma, proximal, kdt, dt)

    # PCG with x0 = 0, preconditioner M^-1 = solve1, fixed 1 + refine_steps
    # iterations (static loop; no data-dependent control flow)
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    x = jnp.zeros_like(rhs)
    r = rhs
    z = solve1(r)
    p = z
    rz = jnp.vdot(r, z).real
    for _ in range(1 + max(refine_steps, 1)):
        Kp = Kmv(p)
        pKp = jnp.vdot(p, Kp).real
        live = pKp > tiny
        alpha = jnp.where(live, rz / jnp.where(live, pKp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Kp
        z = solve1(r)
        rz_new = jnp.vdot(r, z).real
        beta = jnp.where(live, rz_new / jnp.where(rz > tiny, rz, 1.0), 0.0)
        rz = rz_new
        p = z + beta * p
    finite = jnp.all(jnp.isfinite(x))
    dx = jnp.where(finite, x, jnp.zeros_like(x))
    return dx, (Ktilde, w_app)
