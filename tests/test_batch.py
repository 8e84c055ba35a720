"""Batched (vmap) and sharded (mesh) solving tests."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import qpdo_tpu as qt
from qpdo_tpu.parallel import solve_batch, solve_batch_sharded

from utils import kkt_residuals, random_qp


def _batch_problems(B, n, m, seed0=100):
    Qs, qs, As, ls, us = [], [], [], [], []
    for b in range(B):
        Q, q, A, l, u = random_qp(n, m, seed=seed0 + b)
        Qs.append(Q); qs.append(q); As.append(A); ls.append(l); us.append(u)
    return qt.Problem(
        Q=jnp.asarray(np.stack(Qs)), q=jnp.asarray(np.stack(qs)),
        A=jnp.asarray(np.stack(As)), l=jnp.asarray(np.stack(ls)),
        u=jnp.asarray(np.stack(us)), c=jnp.zeros(B))


def test_batch_matches_single():
    B, n, m = 4, 20, 15
    problems = _batch_problems(B, n, m)
    res = solve_batch(problems, qt.Settings())
    assert res.x.shape == (B, n)
    for b in range(B):
        assert int(res.info.status_val[b]) == qt.SOLVED
        single = qt.solve(jax.tree.map(lambda a: a[b], problems))
        np.testing.assert_allclose(np.asarray(res.x[b]),
                                   np.asarray(single.x), atol=1e-9)
        # lock-step batching must not change per-problem iteration counts
        assert int(res.info.iterations[b]) == int(single.info.iterations)


def test_batch_kkt():
    B, n, m = 8, 30, 20
    problems = _batch_problems(B, n, m, seed0=200)
    res = solve_batch(problems)
    for b in range(B):
        assert int(res.info.status_val[b]) == qt.SOLVED
        rp, rd = kkt_residuals(np.asarray(problems.Q[b]), np.asarray(problems.q[b]),
                               np.asarray(problems.A[b]), np.asarray(problems.l[b]),
                               np.asarray(problems.u[b]), res.x[b], res.y[b])
        assert rp <= 1e-6 and rd <= 1e-6


def test_batch_mixed_status():
    """A batch mixing solvable and infeasible problems latches statuses
    independently (the hard part of lock-step batching, SURVEY.md §7)."""
    # degenerate solvable + primal infeasible + dual infeasible from
    # examples/infeasibility_tests.m, padded to common shapes
    def prob(qp_a, qp_b, qp_c):
        Q = np.array([[1.0, 0.0], [0.0, 0.0]])
        q = np.array([1.0, qp_c])
        A = np.array([[qp_a, qp_a], [1.0, 0.0], [0.0, 1.0]])
        l = np.array([-np.inf, 1.0, 1.0])
        u = np.array([0.0, 3.0, qp_b])
        return Q, q, A, l, u

    trips = [prob(0.0, 3.0, 0.0), prob(1.0, 3.0, 0.0), prob(0.0, np.inf, -1.0)]
    inf = qt.QPDO_INFTY
    problems = qt.Problem(
        Q=jnp.asarray(np.stack([t[0] for t in trips])),
        q=jnp.asarray(np.stack([t[1] for t in trips])),
        A=jnp.asarray(np.stack([t[2] for t in trips])),
        l=jnp.clip(jnp.asarray(np.stack([t[3] for t in trips])), -inf, inf),
        u=jnp.clip(jnp.asarray(np.stack([t[4] for t in trips])), -inf, inf),
        c=jnp.zeros(3))
    res = solve_batch(problems, qt.Settings(max_iter=100))
    assert int(res.info.status_val[0]) == qt.SOLVED
    assert int(res.info.status_val[1]) == qt.PRIMAL_INFEASIBLE
    assert int(res.info.status_val[2]) == qt.DUAL_INFEASIBLE


def test_batch_compact_identical():
    """Straggler compaction must not change any per-problem result."""
    B, n, m = 12, 24, 18
    problems = _batch_problems(B, n, m, seed0=400)
    for s in (qt.Settings(max_iter=300, inner_max_iter=50),
              qt.Settings(max_iter=300, inner_max_iter=50,
                          kkt_dtype="float32", refine_steps=2,
                          hybrid_warmup=True, mu_min=1e-7)):
        r1 = solve_batch(problems, s)
        r2 = solve_batch(problems, s, compact=True)
        np.testing.assert_array_equal(np.asarray(r1.info.status_val),
                                      np.asarray(r2.info.status_val))
        np.testing.assert_array_equal(np.asarray(r1.info.iterations),
                                      np.asarray(r2.info.iterations))
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


def test_batch_sharded_over_mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devs[:8]), ("batch",))
    B, n, m = 16, 16, 12
    problems = _batch_problems(B, n, m, seed0=300)
    res = solve_batch_sharded(problems, mesh)
    assert np.all(np.asarray(res.info.status_val) == qt.SOLVED)
    # matches the unsharded result bitwise-stable numerics not guaranteed,
    # but to tight tolerance
    res_local = solve_batch(problems)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_local.x),
                               atol=1e-8)


def test_batch_compact_iter_cap_with_skew():
    """Regression: with hybrid warmup the batch enters phase 2 with skewed
    per-problem iter counters; the compact full-batch phase must freeze
    iter-capped problems explicitly or they step past max_iter."""
    probs = _batch_problems(6, 20, 15, seed0=500)
    # make one problem unsolvable-but-undetectable (primal infeasible with
    # detection disabled): it must stop exactly at max_iter
    Q = np.zeros((20, 20)); Q[0, 0] = 1.0
    A = np.zeros((15, 20)); A[0, 0] = 1.0; A[1, 0] = 1.0
    l = np.full(15, -qt.QPDO_INFTY); u = np.full(15, qt.QPDO_INFTY)
    l[0], u[0] = 1.0, 2.0    # x0 in [1,2]
    l[1], u[1] = 5.0, 6.0    # and x0 in [5,6]: infeasible
    q = np.zeros(20)
    probs = jax.tree.map(
        lambda batch, one: batch.at[0].set(jnp.asarray(one)),
        probs, qt.Problem(Q=Q, q=q, A=A, l=l, u=u, c=np.zeros(())))
    s = qt.Settings(max_iter=60, inner_max_iter=10, hybrid_warmup=True,
                    kkt_dtype="float32", refine_steps=1, mu_min=1e-7,
                    eps_prim_inf=0.0, eps_dual_inf=0.0)
    r1 = solve_batch(probs, s)
    r2 = solve_batch(probs, s, compact=True)
    assert int(np.asarray(r1.info.iterations).max()) <= 60
    assert int(np.asarray(r2.info.iterations).max()) <= 60
    np.testing.assert_array_equal(np.asarray(r1.info.iterations),
                                  np.asarray(r2.info.iterations))
    np.testing.assert_array_equal(np.asarray(r1.info.status_val),
                                  np.asarray(r2.info.status_val))
    # Iterates: solved problems must agree to solver tolerance.  MAX_ITER
    # problems are compared loosely — when the warmup stall guard skews
    # phase-1 exits, a straggler can finish its float32 warmup inside a
    # compacted sub-batch whose XLA program vectorizes f32 reductions
    # differently from the full-batch program (ulp-level seed), and a
    # non-converged iterate amplifies that seed; the contract is identical
    # *decisions* + oracle-verified results, not bitwise iterates across
    # differently-shaped programs (see _solve_batch_compact docstring).
    solved = np.asarray(r1.info.status_val) == qt.SOLVED
    x1 = np.nan_to_num(np.asarray(r1.x))
    x2 = np.nan_to_num(np.asarray(r2.x))
    np.testing.assert_allclose(x1[solved], x2[solved], atol=1e-6)
    np.testing.assert_allclose(x1[~solved], x2[~solved], atol=1e-2)


def test_compact_mixed_mode_oracle_verified():
    """Compaction + anchored mixed GEMMs (the TPU bench configuration):
    every solved member verified against the independent KKT oracle."""
    import jax.numpy as jnp
    from qpdo_tpu.parallel.batch import _solve_batch_compact
    from utils import kkt_residuals, random_qp

    B, n, m = 16, 40, 60
    rng = np.random.default_rng(0)
    probs = []
    for b in range(B):
        probs.append(random_qp(n, m, seed=500 + b))
    batch = qt.Problem(
        Q=jnp.stack([jnp.asarray(p[0]) for p in probs]),
        q=jnp.stack([jnp.asarray(p[1]) for p in probs]),
        A=jnp.stack([jnp.asarray(p[2]) for p in probs]),
        l=jnp.stack([jnp.asarray(p[3]) for p in probs]),
        u=jnp.stack([jnp.asarray(p[4]) for p in probs]),
        c=jnp.zeros((B,)))
    s = qt.Settings(phase2_gemm_dtype="float32", hard_rows=8,
                    anchor_every=10, kkt_dtype="float32", refine_steps=2,
                    mu_min=1e-7, cert_dtype="float32",
                    linesearch="bisect", linesearch_dtype="float32",
                    hybrid_warmup=True, warmup_eps=1e-4,
                    eps_abs=1e-6, max_iter=300, inner_max_iter=50,
                    eps_abs_in=0.1, rho=0.02, delta=0.1)
    res = _solve_batch_compact(batch, s, None, None, False, False)
    for b in range(B):
        assert int(res.info.status_val[b]) == qt.SOLVED, b
        rp, rd = kkt_residuals(*probs[b], np.asarray(res.x[b]),
                               np.asarray(res.y[b]))
        assert rp < 1e-6 and rd < 1e-6, (b, rp, rd)


def test_compact_warmstart_hybrid_with_infeasible():
    """Compaction + warm-start + hybrid warmup with a primal-infeasible
    member in the same batch (VERDICT r1 weak-item 6: the one untested
    combination): results must match the uncompacted path exactly, the
    infeasible member must certify, and warm-started solvable members
    must still verify against the KKT oracle."""
    from utils import kkt_residuals, random_qp

    B, n, m = 8, 20, 15
    probs = [random_qp(n, m, seed=700 + b) for b in range(B)]
    batch = qt.Problem(
        Q=jnp.stack([jnp.asarray(p[0]) for p in probs]),
        q=jnp.stack([jnp.asarray(p[1]) for p in probs]),
        A=jnp.stack([jnp.asarray(p[2]) for p in probs]),
        l=jnp.stack([jnp.asarray(p[3]) for p in probs]),
        u=jnp.stack([jnp.asarray(p[4]) for p in probs]),
        c=jnp.zeros((B,)))
    # member 0: primal infeasible (x0 in [1,2] and x0 in [5,6])
    Q = np.zeros((n, n)); Q[0, 0] = 1.0
    A = np.zeros((m, n)); A[0, 0] = 1.0; A[1, 0] = 1.0
    l = np.full(m, -qt.QPDO_INFTY); u = np.full(m, qt.QPDO_INFTY)
    l[0], u[0] = 1.0, 2.0
    l[1], u[1] = 5.0, 6.0
    batch = jax.tree.map(
        lambda arr, one: arr.at[0].set(jnp.asarray(one)), batch,
        qt.Problem(Q=Q, q=np.zeros(n), A=A, l=l, u=u, c=np.zeros(())))

    # warm starts: solve each solvable member loosely first
    loose = solve_batch(batch, qt.Settings(eps_abs=1e-2, max_iter=100))
    x0 = jnp.nan_to_num(loose.x)
    y0 = jnp.nan_to_num(loose.y)

    s = qt.Settings(eps_abs=1e-6, max_iter=500, inner_max_iter=50,
                    hybrid_warmup=True, kkt_dtype="float32",
                    refine_steps=2, mu_min=1e-7, warmup_eps=1e-4)
    r_plain = solve_batch(batch, s, x0=x0, y0=y0)
    r_comp = solve_batch(batch, s, x0=x0, y0=y0, compact=True)

    np.testing.assert_array_equal(np.asarray(r_plain.info.status_val),
                                  np.asarray(r_comp.info.status_val))
    np.testing.assert_array_equal(np.asarray(r_plain.info.iterations),
                                  np.asarray(r_comp.info.iterations))
    np.testing.assert_array_equal(np.nan_to_num(np.asarray(r_plain.x)),
                                  np.nan_to_num(np.asarray(r_comp.x)))
    assert int(r_comp.info.status_val[0]) == qt.PRIMAL_INFEASIBLE
    for b in range(1, B):
        assert int(r_comp.info.status_val[b]) == qt.SOLVED, b
        rp, rd = kkt_residuals(*probs[b], np.asarray(r_comp.x[b]),
                               np.asarray(r_comp.y[b]))
        assert rp < 1e-5 and rd < 1e-5, (b, rp, rd)


def test_batched_ns_mode_bench_path():
    """The shipped TPU bench configuration (kkt_solver="ns", 5 steps,
    init-only inverse, polish off, hybrid warmup to 1e-4) through the
    straggler-compaction batch path — every member oracle-verified."""
    from qpdo_tpu.parallel.batch import _solve_batch_compact

    B, n, m = 12, 40, 60
    rng = np.random.default_rng(17)
    M = rng.standard_normal((B, n, n))
    Q = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    probs = qt.Problem(
        Q=jnp.asarray(Q), q=jnp.asarray(rng.standard_normal((B, n))),
        A=jnp.asarray(rng.standard_normal((B, m, n))),
        l=jnp.asarray(-rng.random((B, m))),
        u=jnp.asarray(rng.random((B, m))), c=jnp.zeros((B,)))
    s = qt.Settings(eps_abs=1e-6, max_iter=400, inner_max_iter=50,
                    eps_abs_in=0.1, rho=0.02, delta=0.1, refine_steps=2,
                    kkt_dtype="float32", hybrid_warmup=True, mu_min=1e-7,
                    linesearch="bisect", linesearch_dtype="float32",
                    phase2_gemm_dtype="float32", warmup_eps=1e-4,
                    warmup_refine_steps=0, kkt_solver="ns",
                    kkt_ns_steps=5, kkt_inv_refresh=False)
    r = _solve_batch_compact(probs, s, None, None, False, False)
    assert np.all(np.asarray(r.info.status_val) == qt.SOLVED)
    x, y = np.asarray(r.x), np.asarray(r.y)
    An = np.asarray(probs.A)
    Ax = np.einsum("bmn,bn->bm", An, x)
    rp = np.abs(Ax - np.clip(Ax + y, np.asarray(probs.l),
                             np.asarray(probs.u))).max()
    rd = np.abs(np.einsum("bij,bj->bi", Q, x) + np.asarray(probs.q)
                + np.einsum("bmn,bm->bn", An, y)).max()
    assert rp < 1.1e-6 and rd < 1.1e-6
