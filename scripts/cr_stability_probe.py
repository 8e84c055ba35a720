"""CR-depth stability probe on the LISWET ladder level 704 (RESULTS.md).

The aggressive ladder schedule (delta=1e-4, mu_min=1e-7) drives
cond(K) ~ 1e7; full-depth float32 cyclic reduction diverges there while
the sequential scan factorization converges (root cause, round 3).
This probe solves level 704 cold under banded_algo="scan" and under
"cr" at a sweep of banded_cr_levels, printing one JSON line per cell —
the round-4 acceptance evidence for the depth-limited hybrid CR.

  QPDO_PROBE_PLATFORM=cpu python scripts/cr_stability_probe.py [levels...]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

plat = os.environ.get("QPDO_PROBE_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
    # importing examples/continuation below silently re-pins the platform
    # to cpu unless this gate is set — the r4h "on-TPU" cr704 cell ran on
    # CPU exactly this way (logs/cr704_tpu_r4b.log: "backend": "cpu")
    if plat != "cpu":
        os.environ["QPDO_EX_TPU"] = "1"
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, "/root/repo/examples")
from continuation import liswet  # noqa: E402

if plat:  # the import above may have re-pinned it; assert-and-restore
    jax.config.update("jax_platforms", plat)

import qpdo_tpu as qt  # noqa: E402


def main():
    rng = np.random.default_rng(42)
    N = 22500
    t_fine = np.linspace(0, 1, N)
    d_fine = np.sin(4 * np.pi * t_fine) + 0.1 * rng.standard_normal(N)
    grid_levels = [int(x) for x in (sys.argv[1:] or ["704"])]

    # mu_min default 1e-7 reproduces the historical TPU-safe config;
    # QPDO_PROBE_MU_MIN=1e-9 probes the reference default (constants.h:55)
    # now that PCG refinement carries f32 factors at cond ~ 1/mu_min
    # (RESULTS.md round 4: the LISWET rp floor ~ mu_min * |y - ybar| is a
    # mu_min artifact, not a factorization limit).
    mu_min = float(os.environ.get("QPDO_PROBE_MU_MIN", "1e-7"))
    base = qt.Settings(eps_abs=1e-6, max_iter=3000, inner_max_iter=100,
                       eps_abs_in=0.1, rho=0.2, delta=1e-4, theta=0.9,
                       kkt_dtype="float32", mu_min=mu_min, refine_steps=3,
                       max_time=600.0)

    cells = [("scan", 0)] + [("cr", d) for d in (0, 2, 4, 6)]
    sel = os.environ.get("QPDO_PROBE_CELLS")
    if sel:  # e.g. "scan,cr0" — trims compiles on the slow-compile TPU
        want = set(sel.split(","))
        cells = [(a, d) for a, d in cells
                 if (a if a == "scan" else f"cr{d}") in want]
    for lvl in grid_levels:
        prob = liswet(lvl, np.interp(np.linspace(0, 1, lvl), t_fine, d_fine))
        Q, q, A, l, u = prob
        for algo, depth in cells:
            s = base.replace(banded_algo=algo, banded_cr_levels=depth)
            t0 = time.time()
            r = qt.solve_sparse(*prob, settings=s)
            st = int(np.asarray(r.info.status_val))
            x, y = np.asarray(r.x), np.asarray(r.y)
            Ax = A @ x
            rp = float(np.max(np.abs(Ax - np.clip(Ax + y, l, u))))
            rd = float(np.max(np.abs(Q @ x + q + A.T @ y)))
            print(json.dumps({
                "level": lvl, "algo": algo, "cr_levels": depth,
                "status": st, "iters": int(r.info.iterations),
                "rp": rp, "rd": rd,
                "verified": bool(max(rp, rd) < 1e-5),
                "secs": round(time.time() - t0, 1),
                "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
