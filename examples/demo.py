"""Random sparse QP demo: cold solve + warm-started re-solve.

Python port of the reference's canonical example (examples/demo_mex.m):
an ill-conditioned random sparse QP (n=200, m=100, density 0.1), solved
cold, KKT residuals recomputed independently, then re-solved warm from a
perturbed solution.

Run:  python examples/demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import qpdo_tpu as qt


def main():
    rng = np.random.default_rng(123456)
    n, m, density = 200, 100, 0.1

    M = rng.standard_normal((n, n)) * (rng.random((n, n)) < density)
    Q = M @ M.T / n + 1e-3 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n)) * (rng.random((m, n)) < density)
    l = -rng.random(m)
    u = rng.random(m)
    print("Problem ready\n")

    solver = qt.QPDO()
    settings = solver.default_settings().replace(
        max_iter=200, eps_abs=1e-6, verbose=True, print_interval=1)
    solver.setup(Q, q, A, l, u, settings=settings)
    print("Solver ready\n")

    # cold start
    res = solver.solve()
    print(f"Run time: {float(res.info.run_time):.4f} s")
    print(f"Status: {res.info.status}")

    x, y = np.asarray(res.x), np.asarray(res.y)
    rp = np.max(np.abs(A @ x - np.clip(A @ x + y, l, u)))
    rd = np.max(np.abs(Q @ x + q + A.T @ y))
    print(f"primal res: {rp:.4e}")
    print(f"  dual res: {rd:.4e}\n")

    # warm start from a perturbed solution
    solver.warm_start(x + 1e-3 * rng.standard_normal(n),
                      y + 1e-3 * rng.standard_normal(m))
    print("Solver warm-started\n")
    res = solver.solve()
    print(f"Run time: {float(res.info.run_time):.4f} s")
    print(f"Status: {res.info.status}")

    solver.delete()
    print("That's all folks!")


if __name__ == "__main__":
    main()
