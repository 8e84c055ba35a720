"""On-device validation of the banded block-cyclic-reduction backend.

The "cr" factorization (operators.py _banded_factor_cr) was designed for
TPU — O(log nb) depth of batched MXU ops replacing the reference's
sequential sparse LDL' (cholmod_interface.c:8-30) — but every recorded
banded solve through round 2 ran on CPU f64.  This script solves banded
mm_like instances with banded_algo="cr" on the attached backend and
oracle-verifies each solution host-side.

TPU-safe precision: the factorization runs in kkt_dtype="float32"
(a float64 Cholesky on the axon TPU is the documented device-crash path,
CLAUDE.md) with float64 state + refinement; mu_min=1e-7 per the
kkt_dtype="float32" rule.

    QPDO_BANDED_PLATFORM=cpu python scripts/tpu_banded_cr.py   # rehearsal
    python scripts/tpu_banded_cr.py                            # on-TPU
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

plat = os.environ.get("QPDO_BANDED_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
jax.config.update("jax_enable_x64", True)

import numpy as np

import qpdo_tpu as qt

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks"))
from mm_like import gen_cont, gen_gouldqp, gen_qband  # noqa: E402

CASES = [
    ("GOULDQP_n3500", gen_gouldqp, 3500),
    ("QBAND_n5000", gen_qband, 5000),
    ("CONT_k32", gen_cont, 32),
]


def main() -> None:
    rng = np.random.default_rng(42)
    settings = qt.Settings(
        eps_abs=1e-6, max_iter=int(os.environ.get("QPDO_BANDED_MAXIT",
                                                  "30000")),
        inner_max_iter=100, eps_abs_in=0.1, rho=0.02, delta=0.1,
        banded_algo="cr", kkt_dtype="float32", mu_min=1e-7,
        refine_steps=int(os.environ.get("QPDO_BANDED_REFINE", "3")))
    ok_all = True
    for name, gen, arg in CASES:
        Q, q, A, l, u = gen(rng, arg)
        print(json.dumps({"phase": "solve_start", "case": name,
                          "n": Q.shape[0], "m": A.shape[0],
                          "t": round(time.time(), 1)}), flush=True)
        t0 = time.perf_counter()
        res = qt.solve_sparse(Q, q, A, l, u, settings=settings)
        st = int(np.asarray(res.info.status_val))  # host sync
        dt = time.perf_counter() - t0
        x, y = np.asarray(res.x), np.asarray(res.y)
        if st == qt.SOLVED:
            Ax = A @ x
            rp = float(np.max(np.abs(Ax - np.clip(Ax + y, l, u))))
            rd = float(np.max(np.abs(Q @ x + q + A.T @ y)))
            verified = rp < 1e-5 and rd < 1e-5
        else:
            rp = rd = float("nan")
            verified = False
        ok_all &= verified
        print(json.dumps({
            "case": name, "backend": jax.default_backend(),
            "status": st, "iters": int(res.info.iterations),
            "time_s": round(dt, 1), "rp": rp, "rd": rd,
            "verified": verified}), flush=True)
    print(json.dumps({"phase": "done", "all_verified": ok_all}), flush=True)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
