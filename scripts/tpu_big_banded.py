"""Reference-top-end banded QPS instances ON the device (round-4 verdict
item 8): BIGGQP12K (n=12,000 spring-chain) and BIGQBAND20K (n=20,000
band-Gram) through the native sparse parse onto the banded direct path —
the MM suite's upper size range, previously evidenced on-TPU only to
n=10,000 (mm_like GOULDQP).

TPU-safe config: float32 banded factorization (cr + accuracy-gated scan
fallback) with f64 state/refinement, host-chunked adaptive driving, and
crash-resilient segmentation.  One JSON line per instance, oracle-checked.
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
    generate_suite(suite)  # additive top-up

    from qpdo_tpu.native import read_qps_native

    s = qt.Settings(eps_abs=1e-6, max_iter=5000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.2, delta=1e-4, theta=0.9,
                    kkt_dtype="float32", mu_min=1e-7, refine_steps=3,
                    max_time=float(os.environ.get("QPDO_BB_MAXTIME",
                                                  "3600")),
                    crash_recovery=3)
    files = os.environ.get("QPDO_BB_FILES",
                           "biggqp12k.qps,bigqband20k.qps").split(",")
    for f in files:
        d = read_qps_native(os.path.join(suite, f), dense=False)
        t0 = time.time()
        r = qt.solve_sparse(d.Q, d.q, d.A, d.l, d.u, d.c, settings=s)
        st = int(np.asarray(r.info.status_val))
        x, y = np.asarray(r.x), np.asarray(r.y)
        Q, A = d.Q.tocsr(), d.A.tocsr()
        Ax = A @ x
        rp = float(np.max(np.abs(Ax - np.clip(Ax + y, d.l, d.u))))
        rd = float(np.max(np.abs(Q @ x + d.q + A.T @ y)))
        print(json.dumps({"file": f, "n": int(d.Q.shape[0]),
                          "m": int(d.A.shape[0]), "status": st,
                          "iters": int(r.info.iterations),
                          "rp": rp, "rd": rd,
                          "verified": bool(max(rp, rd) < 1e-5),
                          "secs": round(time.time() - t0, 1),
                          "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
