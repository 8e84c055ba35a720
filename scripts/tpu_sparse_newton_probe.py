"""Standalone probe: sparse-path Newton solves on TPU vs CPU reference.

Tests the hypothesis that the on-TPU sparse stall (rp plateau identical
across CG variants) is CG returning garbage/zeros on the device.

Hardened after the 08-19 attempt hung with no output: runs a SIZE LADDER
(small n first) with a phase-stamped line before every compile/execute
step, and isolates each (size, variant) cell in a subprocess with its own
timeout — a device hang at one cell leaves every earlier cell's evidence
on stdout and the probe alive.  Usage:

    python scripts/tpu_sparse_newton_probe.py            # the ladder
    python scripts/tpu_sparse_newton_probe.py CELL 500 jacobi   # one cell

CPU float64 reference (QPDO_PROBE_PLATFORM=cpu, 2026-08-19 — inputs are
seed-deterministic, so a TPU run must reproduce dx_norm to f32-ish
accuracy or the diverging op is on-device):

    (n, variant)          dx_norm     rel_residual
    (200,  precond_f32)   794.6686    2.66e-3
    (200,  jacobi)        794.6487    2.08e-4
    (500,  precond_f32)   1106.1873   8.41e-2
    (500,  jacobi)        1107.1015   7.24e-2
    (2000, precond_f32)   4301.7475   9.89e-1
    (2000, jacobi)        4297.5457   1.25e0

(the rising rel_residual with n is the probe's synthetic call hitting the
CG iteration cap — expected; in the real solver loop CG warm starts and
the adaptive tolerance keep it effective.  The probe's signal is
TPU-vs-CPU *agreement* on dx, not the absolute residual.)

NOTE: the pre-hardening 08-19 TPU attempt (logs/tpu_sparse_newton_probe.log,
dx_norm 4240.7 at n=2000) used *different inputs* — l,u were rng draws then,
shifting the RNG stream feeding rhs — so that number is NOT comparable to
the CPU table above despite the near-match; the TPU must be re-run with
this script.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SIZES = [200, 500, 2000]
VARIANTS = ["precond_f32", "jacobi"]
# >= 1500 s: the documented per-program TPU compile time is 10-20 min
# (CLAUDE.md), so a timeout below that would abort on a healthy-but-slow
# compile.  A timeout is retried once with double budget (slow compile);
# only a nonzero EXIT (crash) or a repeated timeout aborts the ladder.
CELL_TIMEOUT_S = float(os.environ.get("QPDO_PROBE_CELL_TIMEOUT", "1500"))


def stamp(phase: str, **kw) -> None:
    print(json.dumps({"phase": phase, "t": round(time.time(), 1), **kw}),
          flush=True)


def run_cell(n: int, variant: str) -> None:
    """One (size, variant) probe in THIS process (invoked as a subprocess)."""
    import jax
    # the env var alone is ignored (sitecustomize pre-registers axon);
    # QPDO_PROBE_PLATFORM=cpu lets the ladder be rehearsed off-device
    plat = os.environ.get("QPDO_PROBE_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sps
    import qpdo_tpu as qt
    from qpdo_tpu.solver.sparse import setup_sparse
    from qpdo_tpu.solver.core import as_operator

    m = (3 * n) // 4
    rng = np.random.default_rng(11)
    B = sps.random(n, n, density=4.0 / n, random_state=11, format="csr")
    Q = (B.T @ B + 0.1 * sps.eye(n)).tocsr()
    A = sps.random(m, n, density=min(1.0, 6.0 / n), random_state=12,
                   format="csr")
    q = rng.standard_normal(n)

    # NOTE: no f64-preconditioner variant — a float64 block-Jacobi
    # Cholesky on the TPU is the documented device-crash path (CLAUDE.md);
    # precond_dtype="float32" everywhere on-device.
    settings = {
        "precond_f32": qt.Settings(newton_direct=False, mu_min=1e-7,
                                   precond_dtype="float32"),
        "jacobi": qt.Settings(newton_direct=False, mu_min=1e-7,
                              precond="jacobi"),
    }[variant]

    stamp("setup", n=n, variant=variant)
    op = as_operator(setup_sparse(Q, q, A, np.full(m, -1.0), np.ones(m),
                                  0.0, dtype="float64",
                                  precond=settings.precond,
                                  precond_block=settings.precond_block))
    mvec = jnp.full((m,), 1e-2)
    active = (jnp.arange(m) % 3 == 0).astype(jnp.float64)
    rhs = jnp.asarray(rng.standard_normal(n))

    stamp("compile_start", n=n, variant=variant)
    solve = jax.jit(lambda a, mu, r: op.newton_solve(
        a, mu, jnp.asarray(1e-3), r, settings))
    t0 = time.time()
    dx = solve(active, mvec, rhs)
    dx_host = np.asarray(dx)  # host transfer = the only reliable axon sync
    stamp("execute_done", n=n, variant=variant,
          compile_and_run_s=round(time.time() - t0, 2))

    # residual in the operator's own (scaled) space, recomputed on host
    w = active / mvec
    Kdx = np.asarray(op.Qmv(dx) + 1e-3 * dx + op.Atmv(w * op.Amv(dx)))
    rel = np.linalg.norm(Kdx - np.asarray(rhs)) / np.linalg.norm(rhs)
    print(json.dumps({"variant": variant, "n": n,
                      "dx_norm": float(np.linalg.norm(dx_host)),
                      "rel_residual": float(rel),
                      "finite": bool(np.all(np.isfinite(dx_host)))}),
          flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "CELL":
        run_cell(int(sys.argv[2]), sys.argv[3])
        return
    def attempt(n: int, variant: str, timeout_s: float):
        """Run one cell subprocess; returns (rc, timed_out)."""
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "CELL",
             str(n), variant])
        try:
            return proc.wait(timeout=timeout_s), False
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            return -1, True

    for n in SIZES:
        for variant in VARIANTS:
            stamp("cell_start", n=n, variant=variant,
                  timeout_s=CELL_TIMEOUT_S)
            rc, timed_out = attempt(n, variant, CELL_TIMEOUT_S)
            if timed_out:
                # slow compile, not necessarily a sick device: retry once
                # with double the budget before concluding anything
                stamp("cell_timeout", n=n, variant=variant, retrying=True)
                rc, timed_out = attempt(n, variant, 2 * CELL_TIMEOUT_S)
                if timed_out:
                    stamp("cell_timeout", n=n, variant=variant,
                          retrying=False)
            if rc != 0:
                stamp("cell_failed", n=n, variant=variant, returncode=rc,
                      timed_out=timed_out)
                # a crash (nonzero exit) or a repeated timeout at a small
                # size means the device is in a bad state — do not
                # escalate to bigger shapes
                if n < SIZES[-1]:
                    stamp("ladder_aborted", reason="cell failed; not "
                          "escalating to larger n on a sick device")
                    return
    stamp("ladder_done")


if __name__ == "__main__":
    main()
