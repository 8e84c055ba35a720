"""BIGRAND n=8000 on-TPU retry through crash-resilient segmented driving.

Round 3: this instance crashed the axon worker 4x (fully-jitted AND
host-chunked 32-iteration driving) and was size-capped out of the maros
config.  Round 4 adds (a) adaptive ~20 s chunk targeting and (b)
Settings.crash_recovery — host snapshots per chunk, backend-recovery
wait, restore+resume.  This job retries the instance with both; a worker
crash now costs a recompile, not the solve.  One JSON line per outcome.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax

plat = os.environ.get("QPDO_PROBE_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import qpdo_tpu as qt  # noqa: E402


def main():
    from run import generate_suite

    suite = "/root/repo/benchmarks/generated_suite"
    if not os.path.isdir(suite):
        generate_suite(suite)
    path = os.path.join(suite, "bigrand.qps")

    from qpdo_tpu.native import read_qps_native
    d = read_qps_native(path, dense=False)
    n = d.Q.shape[0]
    print(json.dumps({"file": "bigrand.qps", "n": int(n),
                      "m": int(d.A.shape[0]),
                      "backend": jax.default_backend()}), flush=True)

    # the maros sparse config (benchmarks/run.py) + round-4 resilience
    s = qt.Settings(eps_abs=1e-6, max_iter=5000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.02, delta=0.1,
                    refine_steps=3, kkt_dtype="float32", hybrid_warmup=True,
                    mu_min=1e-7, cg_dtype="float32",
                    precond_dtype="float32", precond_block=64,
                    max_time=float(os.environ.get("QPDO_BIGRAND_MAXTIME",
                                                  "4000")),
                    crash_recovery=3)
    t0 = time.time()
    # Settings.crash_recovery covers crashes inside the chunked solve;
    # this script-level retry also covers setup/device-put crashes (seen
    # 2026-08-19: the worker died during the initial data transfer)
    from qpdo_tpu.solver.driver import _recover_backend
    attempts = int(os.environ.get("QPDO_BIGRAND_ATTEMPTS", "3"))
    r = None
    for a in range(attempts):
        try:
            r = qt.solve_sparse(d.Q, d.q, d.A, d.l, d.u, d.c, settings=s)
            int(np.asarray(r.info.status_val))
            break
        except Exception as e:  # noqa: BLE001 — device loss is untyped
            print(json.dumps({"attempt": a, "error": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)
            if a + 1 >= attempts or not _recover_backend():
                raise
    st = int(np.asarray(r.info.status_val))
    x, y = np.asarray(r.x), np.asarray(r.y)
    Q, A = d.Q.tocsr(), d.A.tocsr()
    Ax = A @ x
    rp = float(np.max(np.abs(Ax - np.clip(Ax + y, d.l, d.u))))
    rd = float(np.max(np.abs(Q @ x + d.q + A.T @ y)))
    print(json.dumps({"status": st, "iters": int(r.info.iterations),
                      "rp": rp, "rd": rd,
                      "verified": bool(max(rp, rd) < 1e-5),
                      "secs": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
