"""Structural fuzzing: random QPs with mixed row senses, zero rows,
rank-deficient Q and large scale disparities must solve to tolerance or
classify correctly.  (A 60-case sweep of this generator ran clean during
round-1 development; the committed version keeps CI fast.)"""

import numpy as np
import pytest

import qpdo_tpu as qt


def _gen(rng):
    n = int(rng.integers(2, 50))
    m = int(rng.integers(1, 70))
    rank = n if rng.random() < 0.6 else int(rng.integers(1, n + 1))
    M = rng.standard_normal((n, rank))
    Q = M @ M.T * (10.0 ** rng.integers(-3, 4)) / n
    q = rng.standard_normal(n) * 10.0 ** rng.integers(-2, 3)
    A = rng.standard_normal((m, n)) * 10.0 ** rng.integers(-2, 3)
    if rng.random() < 0.3:
        A[rng.random(m) < 0.3] = 0.0
    l = -rng.random(m) * 2
    u = rng.random(m) * 2
    kind = rng.random(m)
    l[kind < 0.15] = -np.inf
    u[(kind >= 0.15) & (kind < 0.3)] = np.inf
    eq = kind > 0.85
    l[eq] = u[eq] = rng.standard_normal(eq.sum()) * 0.1
    if rank < n:  # bound singular-Q instances
        A = np.vstack([A, np.eye(n)])
        l = np.concatenate([l, -5 * np.ones(n)])
        u = np.concatenate([u, 5 * np.ones(n)])
    return Q, q, A, l, u


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("hybrid", [False, True])
def test_fuzz(seed, hybrid):
    rng = np.random.default_rng(9000 + seed)
    Q, q, A, l, u = _gen(rng)
    s = qt.Settings(max_iter=3000, hybrid_warmup=hybrid,
                    kkt_dtype="float32" if hybrid else None,
                    refine_steps=2 if hybrid else 1,
                    mu_min=1e-7 if hybrid else 1e-9)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), s)
    st = int(res.info.status_val)
    if st == qt.SOLVED:
        x, y = np.asarray(res.x), np.asarray(res.y)
        lc = np.clip(l, -qt.QPDO_INFTY, qt.QPDO_INFTY)
        uc = np.clip(u, -qt.QPDO_INFTY, qt.QPDO_INFTY)
        Ax = A @ x
        rp = np.max(np.abs(Ax - np.clip(Ax + y, lc, uc)))
        rd = np.max(np.abs(Q @ x + q + A.T @ y))
        assert rp <= 1.1e-6 and rd <= 1.1e-6
    else:
        # a randomly generated instance may legitimately be infeasible /
        # unbounded, but must not exhaust iterations undetected
        assert st in (qt.PRIMAL_INFEASIBLE, qt.DUAL_INFEASIBLE), st


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_incremental(seed):
    """Same structural fuzz through the incremental-KKT path (top-k row
    updates + stale-factor PCG): identical accept criteria."""
    rng = np.random.default_rng(7000 + seed)
    Q, q, A, l, u = _gen(rng)
    s = qt.Settings(max_iter=3000, hybrid_warmup=True,
                    kkt_dtype="float32", refine_steps=2, mu_min=1e-7,
                    kkt_update_rows=8)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), s)
    st = int(res.info.status_val)
    if st == qt.SOLVED:
        x, y = np.asarray(res.x), np.asarray(res.y)
        lc = np.clip(l, -qt.QPDO_INFTY, qt.QPDO_INFTY)
        uc = np.clip(u, -qt.QPDO_INFTY, qt.QPDO_INFTY)
        Ax = A @ x
        rp = np.max(np.abs(Ax - np.clip(Ax + y, lc, uc)))
        rd = np.max(np.abs(Q @ x + q + A.T @ y))
        assert rp <= 1.1e-6 and rd <= 1.1e-6
    else:
        assert st in (qt.PRIMAL_INFEASIBLE, qt.DUAL_INFEASIBLE), st
