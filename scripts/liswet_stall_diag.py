"""Verbose trajectory diagnostic for the LISWET large-n stall class.

Round-4 finding: the on-TPU 90k ladder stalls at n>=5625 (49,664
iterations inside the 3600 s level budget) while the identical CPU
config passes warm (237 iters) — and a COLD CPU solve stalls exactly
like the TPU run does (rp pinned ~3.8e-6 > eps at MAX_ITER=3000,
logs/cr5625_cpu_cold_r4.log).  This drives one cold solve with the
verbose single-step driver so the iteration table shows WHERE the
trajectory pins: inner caps, outer contraction rate, tau, and the
rp/rd split.

  QPDO_DIAG_PLATFORM=cpu python scripts/liswet_stall_diag.py 5625
Env:
  QPDO_DIAG_MU_MIN     (default 1e-7)
  QPDO_DIAG_MAX_ITER   (default 3000)
  QPDO_DIAG_HYBRID     (default 1; 0 disables the f32 warmup phase)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

plat = os.environ.get("QPDO_DIAG_PLATFORM", "cpu")
jax.config.update("jax_platforms", plat)
if plat != "cpu":
    os.environ["QPDO_EX_TPU"] = "1"  # keep continuation's import benign
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, "/root/repo/examples")
from continuation import liswet  # noqa: E402

if plat:
    jax.config.update("jax_platforms", plat)

import qpdo_tpu as qt  # noqa: E402


def main():
    lvl = int(sys.argv[1]) if len(sys.argv) > 1 else 5625
    rng = np.random.default_rng(42)
    N = 22500
    t_fine = np.linspace(0, 1, N)
    d_fine = np.sin(4 * np.pi * t_fine) + 0.1 * rng.standard_normal(N)
    prob = liswet(lvl, np.interp(np.linspace(0, 1, lvl), t_fine, d_fine))
    Q, q, A, l, u = prob

    s = qt.Settings(
        eps_abs=1e-6,
        max_iter=int(os.environ.get("QPDO_DIAG_MAX_ITER", "3000")),
        inner_max_iter=100, eps_abs_in=0.1, rho=0.2, delta=1e-4,
        theta=0.9, kkt_dtype="float32",
        mu_min=float(os.environ.get("QPDO_DIAG_MU_MIN", "1e-7")),
        refine_steps=3, max_time=1800.0,
        hybrid_warmup=os.environ.get("QPDO_DIAG_HYBRID", "1") == "1",
        verbose=True, print_interval=50)

    t0 = time.time()
    r = qt.solve_sparse(*prob, settings=s)
    x, y = np.asarray(r.x), np.asarray(r.y)
    Ax = A @ x
    rp = float(np.max(np.abs(Ax - np.clip(Ax + y, l, u))))
    rd = float(np.max(np.abs(Q @ x + q + A.T @ y)))
    print(f"status={int(r.info.status_val)} iters={int(r.info.iterations)} "
          f"oracle rp={rp:.3e} rd={rd:.3e} ynorm={np.max(np.abs(y)):.3e} "
          f"secs={time.time() - t0:.1f} backend={jax.default_backend()}",
          flush=True)


if __name__ == "__main__":
    main()
