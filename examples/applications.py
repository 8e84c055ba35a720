"""Canonical-formulation tour: Lasso, SVM, portfolio, MPC, NNLS, Huber.

Each constructor in qpdo_tpu.applications reduces a named problem class to
the reference's (Q, q, A, l, u) tuple (interfaces/mex/qpdo.m:50-160) and
solves through the ordinary path — scaling, certificates and warm starting
all apply.  Run: python examples/applications.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # demo: CPU f64
jax.config.update("jax_enable_x64", True)

import qpdo_tpu as qt                    # noqa: E402
from qpdo_tpu import applications as apps  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    s = qt.Settings(verbose=False)

    # Lasso: sparse recovery
    F = rng.standard_normal((60, 25))
    x_true = np.zeros(25)
    x_true[[2, 7, 11]] = [1.5, -2.0, 0.8]
    b = F @ x_true + 0.05 * rng.standard_normal(60)
    res = qt.solve(apps.lasso(F, b, lam=2.0), s)
    x = np.asarray(res.x)[:25]
    print(f"lasso:     {res.info.status}; support "
          f"{np.flatnonzero(np.abs(x) > 1e-6).tolist()} (true [2, 7, 11])")

    # Soft-margin SVM (dual) + primal recovery
    X = np.concatenate([rng.standard_normal((20, 2)) + 2.0,
                        rng.standard_normal((20, 2)) - 2.0])
    ylab = np.concatenate([np.ones(20), -np.ones(20)])
    res = qt.solve(apps.svm_dual(X, ylab, C=1.0), s)
    w, bias = apps.svm_primal_from_dual(X, ylab, 1.0, np.asarray(res.x))
    acc = float(np.mean(np.sign(X @ np.asarray(w) + float(bias)) == ylab))
    print(f"svm:       {res.info.status}; train accuracy {acc:.2f}")

    # Markowitz portfolio (long-only, unit budget)
    M = rng.standard_normal((10, 10))
    Sigma = M @ M.T / 10 + 0.05 * np.eye(10)
    mu = 0.1 * rng.standard_normal(10)
    res = qt.solve(apps.portfolio(mu, Sigma, risk_aversion=2.0), s)
    w = np.asarray(res.x)
    print(f"portfolio: {res.info.status}; sum(w)={w.sum():.6f}, "
          f"{int((w > 1e-6).sum())}/10 assets held")

    # Condensed MPC with input/state boxes, warm-started re-solve
    Ad = np.array([[1.0, 0.1], [0.0, 0.95]])
    Bd = np.array([[0.0], [0.1]])
    x0 = np.array([1.2, 0.0])
    prob = apps.mpc_condensed(Ad, Bd, np.eye(2), 0.1 * np.eye(1), x0, 12,
                              u_lo=[-0.5], u_hi=[0.5])
    res = qt.solve(prob, s)
    prob2 = apps.mpc_condensed(Ad, Bd, np.eye(2), 0.1 * np.eye(1),
                               x0 + 0.02, 12, u_lo=[-0.5], u_hi=[0.5])
    res2 = qt.solve(prob2, s, x0=res.x, y0=res.y)
    print(f"mpc:       {res.info.status}; cold {int(res.info.iterations)} "
          f"iters -> warm re-solve {int(res2.info.iterations)} iters")

    # NNLS and Huber
    res = qt.solve(apps.nonneg_ls(F, b), s)
    print(f"nnls:      {res.info.status}; "
          f"min(x)={float(np.min(np.asarray(res.x))):.2e}")
    b_out = b.copy()
    b_out[::9] += 4.0
    res = qt.solve(apps.huber_fit(F, b_out, delta=0.5), s)
    print(f"huber:     {res.info.status}; robust fit with "
          f"{int((np.abs(F @ np.asarray(res.x)[:25] - b_out) > 0.5).sum())} "
          f"outlier residuals in the linear regime")


if __name__ == "__main__":
    main()
