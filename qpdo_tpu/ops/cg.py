"""Preconditioned conjugate gradients for the Newton system.

The large-n replacement of the reference's sparse LDL' factorization
(src/cholmod_interface.c:8-52): Maros-Mészáros instances run up to
n ~ 90k, where dense O(n^2) storage and O(n^3) factorization stop scaling.
The semismooth-Newton KKT matrix

    K = Q + sigma*I + A' diag(active/mu) A

is SPD by construction (README.md:12), so CG applies without safeguards;
each iteration costs two sparse matvecs (Av, A'(w o Av)) plus one Qv —
O(nnz) — and the Jacobi preconditioner diag(K) is available in O(nnz)
without forming K.  This keeps the whole solve matrix-free: K is never
materialized (the TPU-native analogue of CHOLMOD's fill-reducing sparse
factorization, traded for iteration count).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def pcg(matvec: Callable, rhs, precond, tol: float,
        max_iter: int, x0=None):
    """Solve K x = rhs with preconditioned CG.

    ``tol`` is relative: terminate when ||r||_2 <= tol * ||rhs||_2.
    ``precond`` is either 1/diag(K) (Jacobi) or a callable r -> M^{-1} r
    (e.g. the batched block-Jacobi apply).  Static iteration cap
    ``max_iter`` with early exit via ``lax.while_loop`` — jit-safe,
    vmappable (lock-step across a batch, converged members take no-op
    iterations).  Returns (x, iters, rel_res).
    """
    if not callable(precond):
        diag_inv = precond
        precond = lambda r: diag_inv * r
    dt = rhs.dtype
    rhs_norm = jnp.linalg.norm(rhs)
    tol_abs = jnp.asarray(tol, dt) * jnp.maximum(rhs_norm,
                                                 jnp.asarray(1e-30, dt))

    x = jnp.zeros_like(rhs) if x0 is None else x0
    r = rhs - matvec(x) if x0 is not None else rhs
    z = precond(r)
    p = z
    rz = jnp.dot(r, z)

    def cond(carry):
        x, r, p, rz, k = carry
        return (jnp.linalg.norm(r) > tol_abs) & (k < max_iter)

    def body(carry):
        x, r, p, rz, k = carry
        Kp = matvec(p)
        pKp = jnp.dot(p, Kp)
        # guard: pKp can only vanish at exact convergence (K SPD)
        alpha = rz / jnp.where(pKp > 0, pKp, 1.0)
        alpha = jnp.where(pKp > 0, alpha, 0.0)
        x = x + alpha * p
        r = r - alpha * Kp
        z = precond(r)
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.where(rz > 0, rz, 1.0)
        p = z + jnp.where(rz > 0, beta, 0.0) * p
        return x, r, p, rz_new, k + 1

    x, r, _, _, k = jax.lax.while_loop(
        cond, body, (x, r, p, rz, jnp.asarray(0, jnp.int32)))
    rel = jnp.linalg.norm(r) / jnp.maximum(rhs_norm, jnp.asarray(1e-30, dt))
    return x, k, rel


def pcg_refined(matvec_hi: Callable, matvec_lo: Callable, rhs, precond_lo,
                tol, max_iter: int, rounds: int, lo_dtype, x0=None):
    """Mixed-precision CG: reduced-precision inner solves inside a
    state-dtype iterative-refinement loop.

    The TPU rationale: float64 is emulated (~5x cost per op), so a CG whose
    O(nnz) matvecs and preconditioner run in float64 pays that on every
    iteration.  Classical iterative refinement moves all of it to native
    float32 — each round solves the *correction* system K d = r with an
    inner ``pcg`` entirely in ``lo_dtype`` and only the residual refresh
    r = rhs - K x runs one state-dtype matvec — while recovering
    state-dtype accuracy: the residual contracts by ~the inner tolerance
    per round until the cond(K)*eps_lo floor.  (Same contract as the dense
    path's reduced-precision factorization + refinement,
    ops/linalg.newton_system_solve; same caveat: float32 inner solves
    cannot carry cond(K) ~ 1/mu beyond ~1e7, so combine with
    mu_min >= 1e-7.)

    ``tol`` is relative to ||rhs||; the inner solves run at a tolerance
    clipped to [max(tol, 1e-6), 1e-2] relative to the current residual
    (each round's residual is normalized before the cast, so tiny
    residuals never underflow in ``lo_dtype``).  Returns (x, rounds_done,
    rel_res).
    """
    dt = rhs.dtype
    rhs_norm = jnp.linalg.norm(rhs)
    tol_abs = jnp.asarray(tol, dt) * jnp.maximum(rhs_norm,
                                                 jnp.asarray(1e-30, dt))
    inner_tol = jnp.clip(jnp.asarray(tol, lo_dtype),
                         jnp.asarray(1e-6, lo_dtype),
                         jnp.asarray(1e-2, lo_dtype))

    x = jnp.zeros_like(rhs) if x0 is None else x0
    r = rhs - matvec_hi(x) if x0 is not None else rhs

    def cond(carry):
        x, r, k = carry
        return (jnp.linalg.norm(r) > tol_abs) & (k < rounds)

    def body(carry):
        x, r, k = carry
        rn = jnp.maximum(jnp.linalg.norm(r), jnp.asarray(1e-300, dt))
        d, _, _ = pcg(matvec_lo, (r / rn).astype(lo_dtype), precond_lo,
                      inner_tol, max_iter)
        x = x + rn * d.astype(dt)
        r = rhs - matvec_hi(x)
        return x, r, k + 1

    x, r, k = jax.lax.while_loop(
        cond, body, (x, r, jnp.asarray(0, jnp.int32)))
    rel = jnp.linalg.norm(r) / jnp.maximum(rhs_norm, jnp.asarray(1e-30, dt))
    return x, k, rel


def cg_fixed(matvec: Callable, rhs, precond, iters: int, x0=None):
    """Preconditioned CG with a FIXED iteration count — no convergence
    predicate, no residual-norm reductions, no early exit.

    Rationale (round 5): on TPU the while_loop variant's per-iteration
    convergence test is a scalar reduction + loop-carried predicate that
    costs more than the matvec itself at batched small shapes — the
    kkt_solver="cg" bench A/B measured 4.2x SLOWER than the Cholesky
    path despite the matvec being ~100x cheaper than the factorization.
    A fori_loop with a static trip count compiles to straight-line
    pipelined code; accuracy control moves to the caller (warm start
    from the previous Newton direction + the outer monotone-refinement/
    forcing machinery), matching inexact-Newton semantics.

    Division guards mirror ``pcg``: a converged (or breakdown) lane
    takes no-op steps instead of producing NaN.
    """
    if not callable(precond):
        diag_inv = precond
        precond = lambda r: diag_inv * r

    x = jnp.zeros_like(rhs) if x0 is None else x0
    r = rhs - matvec(x) if x0 is not None else rhs
    z = precond(r)
    p = z
    rz = jnp.dot(r, z)

    def body(_, carry):
        x, r, p, rz = carry
        Kp = matvec(p)
        pKp = jnp.dot(p, Kp)
        alpha = jnp.where(pKp > 0, rz / jnp.where(pKp > 0, pKp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Kp
        z = precond(r)
        rz_new = jnp.dot(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, r, p, rz = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x
