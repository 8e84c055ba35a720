"""Grid-continuation demo: the LISWET family (L1 spline fitting under
second-difference constraints), coarse-to-fine.

The duals of an order-2 finite-difference constraint scale like n^2, so a
cold proximal solve crawls ~n iterations (RESULTS.md "LISWET
convergence").  Solving a ladder of grids and prolonging each solution —
x by interpolation, y by interpolation x (n_f/n_c)^2 — hands every level
a near-converged active set: measured 46x at n=10,000.

Run:  python examples/continuation.py  [N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU/f64 is the right configuration for single large sparse QPs
# (see CLAUDE.md; set QPDO_EX_TPU=1 to try the attached TPU)
if not os.environ.get("QPDO_EX_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sps

import qpdo_tpu as qt


def liswet(n, d):
    """min 0.5||x - d||^2  s.t.  x_i - 2 x_{i+1} + x_{i+2} >= 0."""
    Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
    return Q, -d, A, np.zeros(m), np.full(m, np.inf)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4000

    rng = np.random.default_rng(42)
    t_fine = np.linspace(0, 1, N)
    d_fine = np.sin(4 * np.pi * t_fine) + 0.1 * rng.standard_normal(N)

    # geometric ladder down to ~600 points
    levels = [N]
    while levels[0] > 700:
        levels.insert(0, (levels[0] + 1) // 2)
    print("ladder:", levels)

    problems = [liswet(n, np.interp(np.linspace(0, 1, n), t_fine, d_fine))
                for n in levels]

    def prolong(x, y, i):
        return qt.grid1d_prolong(levels[i], levels[i + 1], order=2)(x, y)

    # LISWET-class schedule (RESULTS.md): aggressive per-row mu shrink
    settings = qt.Settings(eps_abs=1e-6, max_iter=100000,
                           inner_max_iter=100, eps_abs_in=0.1,
                           rho=0.2, delta=1e-4, theta=0.9)
    # mu_min=1e-9 (the reference default, constants.h:55) is REQUIRED on
    # this family: LISWET's 4th-difference dual operator has cond ~ n^4,
    # so the ALM outer contraction at mu_min=1e-7 degrades to ~0.996 per
    # 50 iterations by n=5625 (measured, logs/liswet5625_diag_cpu.log) —
    # the round-4 on-TPU ladder burned 2x3600 s exactly there.  The f32
    # factorization carries mu=1e-9 via the state-dtype escalation
    # (Settings.banded_escalate_rtol; beyond cond ~ 1/eps32 the f32
    # factor NaNs and pre-escalation the duals staircased at rp/mu).
    if os.environ.get("QPDO_EX_TPU"):
        # TPU: float32 banded factorization + f64 state/refinement.
        # max_time forces host-chunked driving (32-iteration device
        # executions): the 2026-08-19 worker crashes under multi-minute
        # single executions of any kind (RESULTS.md crash class).
        settings = settings.replace(kkt_dtype="float32", mu_min=1e-9,
                                    refine_steps=3, max_time=3600.0)
        if os.environ.get("QPDO_EX_RESUME"):
            # process-level resume armed: in-process reattach NEVER
            # succeeds on this fault class (round-5 post-mortem — 8
            # restore backoffs, ~20 min, all failed), so die fast and
            # let the outer retry loop relaunch a fresh process that
            # resumes from the last completed level
            settings = settings.replace(crash_recovery=0)
    if os.environ.get("QPDO_EX_F32"):
        # CPU rehearsal of the exact TPU precision config (no chunking)
        settings = settings.replace(kkt_dtype="float32", mu_min=1e-9,
                                    refine_steps=3)
    if os.environ.get("QPDO_EX_MAXTIME"):
        # CPU rehearsal of the TPU host-chunked driving (solve_driven):
        # the round-4 on-TPU ladder failed at n>=5625 where the unchunked
        # CPU rehearsal passed — chunked driving is the untested delta
        settings = settings.replace(
            max_time=float(os.environ["QPDO_EX_MAXTIME"]))
    if os.environ.get("QPDO_EX_ALGO"):
        # force the banded factorization algorithm (cr/scan) — the CR
        # ladder acceptance runs use this to pin banded_algo="cr" on CPU
        settings = settings.replace(
            banded_algo=os.environ["QPDO_EX_ALGO"])

    # refine_final: a warm fine level can stop with the not-yet-recentered
    # proximal term sigma*(x - xbar) still inside its residual estimate
    # (reference termination semantics); the flag oracle-checks the finest
    # level and warm re-solves once (~1 iteration) when needed.
    def progress(i, r):
        print(f"  n={levels[i]:6d}: {r.info.status:10s} "
              f"{int(r.info.iterations):6d} iters", flush=True)

    # QPDO_EX_RESUME=<path.npz>: process-level ladder resume — the tier
    # above crash_recovery for the axon fault class where the in-process
    # client cannot reattach at all (round 5); pair with an outer retry
    # loop that relaunches this script (scripts/tpu_queue_r5e.sh)
    ladder = qt.solve_continuation(
        problems, settings, prolong=prolong, dtype="float64",
        return_all=True, refine_final=True, progress=progress,
        resume_path=os.environ.get("QPDO_EX_RESUME") or None)

    res = ladder[-1]
    Q, q, A, l, u = problems[-1]
    x, y = np.asarray(res.x), np.asarray(res.y)
    Ax = A @ x
    rp = np.max(np.abs(Ax - np.clip(Ax + y, l, u)))
    rd = np.max(np.abs(Q @ x + q + A.T @ y))
    print(f"final KKT: rp={rp:.2e} rd={rd:.2e} "
          f"(ladder wall time {float(res.info.run_time):.1f} s)")
    assert rp <= 1e-6 and rd <= 1e-6


if __name__ == "__main__":
    main()
