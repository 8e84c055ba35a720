"""Size ladder for the large-n sparse-CG worker crash (2026-08-19).

The n=2000 random-sparse solve runs clean on-TPU (logs/tpu_cg_traj_r3.log)
but the BIGRAND n=8000 instance crashed the axon worker mid-solve
(logs/maros_tpu_r3.log).  This ladder isolates the failing size/stage:
for n in 4000/6000/8000, each subprocess cell (a) checks the BCOO
matvecs against scipy on host, then (b) runs a capped solve.  A cell
crash aborts escalation (sick-device protocol of tpu_sparse_newton_probe).

    QPDO_PROBE_PLATFORM=cpu python scripts/tpu_cg_size_probe.py  # rehearsal
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SIZES = [4000, 6000, 8000]
CELL_TIMEOUT_S = float(os.environ.get("QPDO_PROBE_CELL_TIMEOUT", "1800"))


def stamp(phase: str, **kw) -> None:
    print(json.dumps({"phase": phase, "t": round(time.time(), 1), **kw}),
          flush=True)


def make_instance(n: int):
    import numpy as np
    import scipy.sparse as sps
    rng = np.random.default_rng(5)
    m = (3 * n) // 4
    B = sps.random(n, n, density=4.0 / n, random_state=31, format="csr")
    Q = (B.T @ B + 0.1 * sps.eye(n)).tocsr()
    A = sps.random(m, n, density=6.0 / n, random_state=32, format="csr")
    q = rng.standard_normal(n)
    return Q, q, A, -rng.random(m), rng.random(m)


def run_cell(n: int) -> None:
    import jax
    plat = os.environ.get("QPDO_PROBE_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    import qpdo_tpu as qt
    from qpdo_tpu.solver.sparse import setup_sparse
    from qpdo_tpu.solver.core import as_operator

    Q, q, A, l, u = make_instance(n)
    stamp("setup", n=n)
    op = as_operator(setup_sparse(Q, q, A, l, u, 0.0, dtype="float64",
                                  precond="block_jacobi", precond_block=64))
    # (a) matvec exactness on-device vs scipy on host
    x = np.random.default_rng(7).standard_normal(n)
    stamp("matvec_start", n=n)
    qx = np.asarray(op.Qmv(op.D * x))  # scaled-space matvec, any vector works
    stamp("matvec_done", n=n, finite=bool(np.all(np.isfinite(qx))))

    # (b) capped solve — enough iterations to hit the crash class
    s = qt.Settings(eps_abs=1e-6, newton_direct=False, mu_min=1e-7,
                    hybrid_warmup=True, warmup_eps=1e-3,
                    cg_dtype="float32", precond_dtype="float32",
                    max_iter=int(os.environ.get("QPDO_PROBE_MAXIT", "60")))
    stamp("solve_start", n=n, max_iter=s.max_iter)
    t0 = time.time()
    res = qt.solve_sparse(Q, q, A, l, u, settings=s, dtype="float64")
    st = int(np.asarray(res.info.status_val))
    stamp("solve_done", n=n, status=st,
          iters=int(res.info.iterations),
          rp=float(res.info.res_prim_norm), rd=float(res.info.res_dual_norm),
          secs=round(time.time() - t0, 1))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "CELL":
        run_cell(int(sys.argv[2]))
        return
    for n in SIZES:
        stamp("cell_start", n=n, timeout_s=CELL_TIMEOUT_S)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "CELL", str(n)])
        try:
            rc = proc.wait(timeout=CELL_TIMEOUT_S)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            stamp("cell_timeout", n=n)
            rc = -1
        if rc != 0:
            stamp("cell_failed", n=n, returncode=rc)
            stamp("ladder_aborted", reason="cell failed; not escalating")
            return
    stamp("ladder_done")


if __name__ == "__main__":
    main()
