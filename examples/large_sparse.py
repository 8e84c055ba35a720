"""Large-n sparse solve: n = 10,000 without ever materializing a dense
matrix.

The reference handles large Maros-Mészáros instances through CHOLMOD's
sparse LDL' factorization (src/cholmod_interface.c:35-52); the TPU-native
equivalent is matrix-free: BCOO matvecs + Jacobi/block-Jacobi
preconditioned CG on the always-SPD Newton system (qpdo_tpu/operators.py
SparseOperator, qpdo_tpu/ops/cg.py).

Run:  python examples/large_sparse.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU/f64 is the right configuration for a single large sparse QP
# (see CLAUDE.md; set QPDO_EX_TPU=1 to try the attached TPU)
if not os.environ.get("QPDO_EX_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sps

import qpdo_tpu as qt


def main():
    rng = np.random.default_rng(0)
    n, m_ineq = 10_000, 5_000

    # sparse PSD objective: banded Gram + regularization
    bands = [rng.standard_normal(n - k) for k in range(3)]
    Bm = sps.diags(bands, offsets=[0, 1, 2])
    Q = (Bm.T @ Bm + 0.1 * sps.eye(n)).tocsr()
    q = rng.standard_normal(n)

    # sparse inequality rows + box bounds on all variables
    A_in = sps.random(m_ineq, n, density=5.0 / n, random_state=1,
                      data_rvs=rng.standard_normal).tocsr()
    A = sps.vstack([A_in, sps.eye(n)]).tocsr()
    l = np.concatenate([-rng.random(m_ineq) - 0.5, -2.0 * np.ones(n)])
    u = np.concatenate([rng.random(m_ineq) + 0.5, 2.0 * np.ones(n)])

    print(f"n={n}  m={A.shape[0]}  nnz(Q)={Q.nnz}  nnz(A)={A.nnz}")
    t0 = time.perf_counter()
    res = qt.solve_sparse(Q, q, A, l, u)
    dt = time.perf_counter() - t0

    x, y = np.asarray(res.x), np.asarray(res.y)
    rp = np.max(np.abs(A @ x - np.clip(A @ x + y, l, u)))
    rd = np.max(np.abs(Q @ x + q + A.T @ y))
    print(f"status={res.info.status}  iters={int(res.info.iterations)}  "
          f"time={dt:.1f}s")
    print(f"independent KKT residuals: prim={rp:.2e}  dual={rd:.2e}")
    assert int(res.info.status_val) == qt.SOLVED and rp < 1e-6 and rd < 1e-6

    # warm-started re-solve after a cost perturbation (MPC-style)
    t0 = time.perf_counter()
    res2 = qt.solve_sparse(Q, q + 1e-3 * rng.standard_normal(n), A, l, u,
                           x0=res.x, y0=res.y)
    print(f"warm re-solve: iters={int(res2.info.iterations)} "
          f"(cold: {int(res.info.iterations)}), "
          f"time={time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
