"""Degenerate and primal/dual infeasible QPs with certificate validation.

Python port of the reference's acceptance script
(examples/infeasibility_tests.m): three tiny QPs with hard-asserted status
codes, plus numerical validation of the Farkas-type certificates.

Run:  python examples/infeasibility.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import qpdo_tpu as qt


def build(qp_a, qp_b, qp_c):
    Q = np.array([[1.0, 0.0], [0.0, 0.0]])
    q = np.array([1.0, qp_c])
    A = np.array([[qp_a, qp_a], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([-np.inf, 1.0, 1.0])
    u = np.array([0.0, 3.0, qp_b])
    return Q, q, A, l, u


def report(name, res):
    print(f"{'status':>20s}: {res.info.status}")
    print(f"{'prox iterations':>20s}: {int(res.info.oterations)}")
    print(f"{'Newton iterations':>20s}: {int(res.info.iterations)}\n")


def main():
    settings = qt.Settings(verbose=False, max_iter=100)

    # degenerate but solvable
    Q, q, A, l, u = build(0.0, 3.0, 0.0)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), settings)
    report("degenerate", res)
    assert int(res.info.status_val) == qt.SOLVED

    # primal infeasible
    Q, q, A, l, u = build(1.0, 3.0, 0.0)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), settings)
    report("primal infeasible", res)
    assert int(res.info.status_val) == qt.PRIMAL_INFEASIBLE
    dy = np.asarray(res.prim_inf_cert)
    norm_dy = np.max(np.abs(dy))
    print("||A'dy||/||dy|| =", np.max(np.abs(A.T @ dy)) / norm_dy)
    fin_u, fin_l = np.isfinite(u), np.isfinite(l)
    oob = (u[fin_u] @ np.maximum(dy[fin_u], 0)
           + l[fin_l] @ np.minimum(dy[fin_l], 0))
    print("out_of_bounds/||dy|| =", oob / norm_dy, "\n")

    # dual infeasible (unbounded below along [0, 1])
    Q, q, A, l, u = build(0.0, np.inf, -1.0)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), settings)
    report("dual infeasible", res)
    assert int(res.info.status_val) == qt.DUAL_INFEASIBLE
    dx = np.asarray(res.dual_inf_cert)
    norm_dx = np.max(np.abs(dx))
    print("||Q dx||/||dx|| =", np.max(np.abs(Q @ dx)) / norm_dx)
    print("q'dx/||dx|| =", (q @ dx) / norm_dx)

    print("\nThat's all folks!")


if __name__ == "__main__":
    main()
