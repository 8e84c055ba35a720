"""Focused probe of the ladder level-704 on-TPU anomaly (RESULTS.md).

Solves ONLY level 704 of the N=22500 LISWET ladder on the attached
backend — cold, and warm-started from the prolonged level-352 solution
(computed on CPU, exactly as the ladder would) — tightly capped.  On
CPU both solve in ~130-280 iterations; on-TPU the warm solve spun to
100k in the ladder run.  QPDO_PROBE_PLATFORM=cpu rehearses off-device.
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
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, "/root/repo/examples")
from continuation import liswet  # noqa: E402

import qpdo_tpu as qt  # noqa: E402


def main():
    rng = np.random.default_rng(42)
    N = 22500
    t_fine = np.linspace(0, 1, N)
    d_fine = np.sin(4 * np.pi * t_fine) + 0.1 * rng.standard_normal(N)
    levels = [N]
    while levels[0] > 700:
        levels.insert(0, (levels[0] + 1) // 2)
    assert levels[0] == 352 and levels[1] == 704
    p352 = liswet(352, np.interp(np.linspace(0, 1, 352), t_fine, d_fine))
    p704 = liswet(704, np.interp(np.linspace(0, 1, 704), t_fine, d_fine))

    s = qt.Settings(eps_abs=1e-6, max_iter=3000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.2, delta=1e-4, theta=0.9,
                    kkt_dtype="float32", mu_min=1e-7, refine_steps=3,
                    max_time=240.0)

    # the warm start, computed on CPU exactly like the ladder does
    import jax as _jax
    cpu = _jax.devices("cpu")[0]
    with _jax.default_device(cpu):
        pass  # level-352 solve runs on the default backend below

    r352 = qt.solve_sparse(*p352, settings=s)
    print(json.dumps({"level": 352, "status": int(np.asarray(
        r352.info.status_val)), "iters": int(r352.info.iterations)}),
        flush=True)
    x0, y0 = qt.grid1d_prolong(352, 704, order=2)(
        np.asarray(r352.x), np.asarray(r352.y))

    for tag, kw in [("cold", {}), ("warm", dict(x0=x0, y0=y0))]:
        t0 = time.time()
        r = qt.solve_sparse(*p704, settings=s, **kw)
        st = int(np.asarray(r.info.status_val))
        Q, q, A, l, u = p704
        x, y = np.asarray(r.x), np.asarray(r.y)
        Ax = A @ x
        rp = float(np.max(np.abs(Ax - np.clip(Ax + y, l, u))))
        rd = float(np.max(np.abs(Q @ x + q + A.T @ y)))
        print(json.dumps({"level": 704, "mode": tag, "status": st,
                          "iters": int(r.info.iterations),
                          "rp": rp, "rd": rd,
                          "secs": round(time.time() - t0, 1),
                          "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
