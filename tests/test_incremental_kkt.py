"""Incremental KKT formation (Settings.kkt_update_rows).

The TPU re-design of the reference's rank-k factor updates (newton.c:21-33,
cholmod_interface.c:57-93): K_tilde carried in the state, top-k |dW| row
updates per iteration, stale-factor-preconditioned CG against the exact K.
"""

import jax
import jax.numpy as jnp
import numpy as np

import qpdo_tpu as qt
from qpdo_tpu.parallel.batch import solve_batch, _solve_batch_compact

BASE = dict(eps_abs=1e-6, max_iter=300, inner_max_iter=50,
            eps_abs_in=0.1, rho=0.02, delta=0.1,
            refine_steps=2, kkt_dtype="float32",
            hybrid_warmup=True, mu_min=1e-7,
            cert_dtype="float32", warmup_eps=1e-4,
            linesearch="bisect", linesearch_dtype="float32",
            phase2_gemm_dtype="float32", hard_rows=8, anchor_every=10)


def make_batch(B=16, n=40, m=60, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((B, n, n))
    Q = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    q = rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n))
    l = -rng.random((B, m))
    u = rng.random((B, m))
    problems = qt.Problem(Q=jnp.asarray(Q), q=jnp.asarray(q),
                          A=jnp.asarray(A), l=jnp.asarray(l),
                          u=jnp.asarray(u), c=jnp.zeros((B,)))
    return problems, (Q, q, A, l, u)


def oracle_max_res(res, raw):
    Q, q, A, l, u = raw
    x, y = np.asarray(res.x), np.asarray(res.y)
    Ax = np.einsum("bmn,bn->bm", A, x)
    rp = np.abs(Ax - np.clip(Ax + y, l, u)).max()
    rd = np.abs(np.einsum("bij,bj->bi", Q, x) + q
                + np.einsum("bmn,bm->bn", A, y)).max()
    return max(rp, rd)


def test_incremental_solves_to_tolerance():
    """k = 12 (below the mu-update spike size): every problem still solves
    and the independent oracle verifies 1e-6; iterations stay within 15%
    of the exact-formation baseline."""
    problems, raw = make_batch()
    base = _solve_batch_compact(problems, qt.Settings(**BASE),
                                None, None, False, False)
    inc = _solve_batch_compact(problems, qt.Settings(**BASE,
                                                     kkt_update_rows=12),
                               None, None, False, False)
    assert np.all(np.asarray(inc.info.status_val) == qt.SOLVED)
    assert oracle_max_res(inc, raw) <= 1.1e-6
    it_base = np.asarray(base.info.iterations).mean()
    it_inc = np.asarray(inc.info.iterations).mean()
    assert it_inc <= 1.15 * it_base + 3


def test_k_geq_m_matches_baseline_iterations():
    """k >= m applies every row change each iteration: K_tilde is exact,
    so trajectories track the non-incremental path (directions differ
    only by PCG-vs-refinement numerics; iteration counts stay within a
    few steps per problem)."""
    problems, raw = make_batch(B=8)
    m = problems.l.shape[-1]
    base = solve_batch(problems, qt.Settings(**BASE,
                                             newton_full_step=False))
    inc = solve_batch(problems, qt.Settings(**BASE, newton_full_step=False,
                                            kkt_update_rows=m))
    assert np.all(np.asarray(inc.info.status_val) == qt.SOLVED)
    it_b = np.asarray(base.info.iterations).astype(float)
    it_i = np.asarray(inc.info.iterations).astype(float)
    assert np.all(np.abs(it_i - it_b) <= np.maximum(4, 0.1 * it_b))


def test_incremental_pure_f64():
    """Incremental mode without hybrid warmup / mixed GEMMs (pure f64
    path, chunked rebuilds via run_loop's incremental branch)."""
    problems, raw = make_batch(B=8)
    st = qt.Settings(eps_abs=1e-8, max_iter=300, kkt_update_rows=12)
    res = solve_batch(problems, st)
    assert np.all(np.asarray(res.info.status_val) == qt.SOLVED)
    assert oracle_max_res(res, raw) <= 1.1e-8


def test_incremental_single_solve_api():
    """qt.solve carries the cache through the non-batched path too."""
    problems, raw = make_batch(B=1)
    prob = jax.tree.map(lambda a: a[0], problems)
    res = qt.solve(prob, qt.Settings(**BASE, kkt_update_rows=12))
    assert int(res.info.status_val) == qt.SOLVED


def test_incremental_infeasible_detection():
    """Infeasibility latching still fires in incremental mode (the
    certificate tests run on exact state quantities, not on K_tilde)."""
    # box [0,1]^2 with x0+x1 in [2.5, 3]: infeasible (the shape of the
    # reference's examples/infeasibility_tests.m primal-infeasible case)
    Q = np.eye(2)
    q = np.zeros(2)
    A = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    l = np.array([0.0, 0.0, 2.5])
    u = np.array([1.0, 1.0, 3.0])
    prob = qt.make_problem(Q, q, A, l, u)
    res = qt.solve(prob, qt.Settings(kkt_update_rows=2))
    assert int(res.info.status_val) == qt.PRIMAL_INFEASIBLE


def test_incremental_verbose_driver(capsys):
    """The chunked host driver (verbose/max_time) threads the KKT cache
    through its per-chunk run_loop calls."""
    problems, raw = make_batch(B=1)
    prob = jax.tree.map(lambda a: a[0], problems)
    res = qt.solve(prob, qt.Settings(**BASE, kkt_update_rows=12,
                                     verbose=True, print_interval=10))
    out = capsys.readouterr().out
    assert int(res.info.status_val) == qt.SOLVED
    assert "QPDO" in out and "r.prim" in out
