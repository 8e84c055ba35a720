"""The OSQP-class ADMM baseline (benchmarks/admm_baseline.py) must be a
correct QP solver — it exists as the same-machine stand-in for the
reference paper's OSQP/QPALM comparison (README.md:11-24), and a broken
baseline would make every comparison row meaningless."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

import qpdo_tpu as qt
from utils import random_qp

from admm_baseline import ADMMSettings, admm_solve


def _oracle(p, x, y):
    Q, q, A, l, u = (np.asarray(a) for a in (p.Q, p.q, p.A, p.l, p.u))
    x, y = np.asarray(x), np.asarray(y)
    Ax = A @ x
    rp = np.max(np.abs(Ax - np.clip(Ax + y, l, u)))
    rd = np.max(np.abs(Q @ x + q + A.T @ y))
    return max(rp, rd)


def test_admm_solves_and_matches_qpdo():
    for seed in range(4):
        Q, q, A, l, u = random_qp(30, 45, seed=seed)
        p = qt.make_problem(Q, q, A, l, u)
        r = admm_solve(p, ADMMSettings(eps_abs=1e-8, max_iter=50000))
        assert bool(r.solved), f"seed {seed}: not solved"
        assert _oracle(p, r.x, r.y) < 1e-7
        # strictly-convex QP: unique primal solution — must match qpdo
        rq = qt.solve(p)
        np.testing.assert_allclose(np.asarray(r.x), np.asarray(rq.x),
                                   rtol=1e-5, atol=1e-6)


def test_admm_batch_vmaps():
    import jax
    import jax.numpy as jnp

    probs = []
    for seed in range(3):
        Q, q, A, l, u = random_qp(20, 30, seed=10 + seed)
        probs.append(qt.make_problem(Q, q, A, l, u))
    batch = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *probs)
    r = jax.vmap(lambda p: admm_solve(p, ADMMSettings(eps_abs=1e-7)))(batch)
    assert bool(np.all(np.asarray(r.solved)))
