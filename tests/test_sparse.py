"""Large-n sparse-CG path: parity with the dense path, scaling parity,
large-instance accuracy, infeasibility detection, warm starts.

The sparse path (SparseOperator + ops/cg.py) plays the role of the
reference's sparse LDL' backend (src/cholmod_interface.c:8-52): same
algorithm, matrix-free Newton solves.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp

import qpdo_tpu as qt
from qpdo_tpu.solver.sparse import setup_sparse
from qpdo_tpu.solver.scaling import scale_problem

from utils import random_qp


def _sparse_of(Q, A):
    return sps.csr_matrix(np.asarray(Q)), sps.csr_matrix(np.asarray(A))


def test_matches_dense():
    """On a small problem the CG path reproduces the dense path's
    trajectory: same status, same iteration count, same solution."""
    Q, q, A, l, u = random_qp(40, 30, seed=0)
    dense = qt.solve(qt.make_problem(Q, q, A, l, u))
    Qs, As = _sparse_of(Q, A)
    sp = qt.solve_sparse(Qs, q, As, l, u)
    assert int(sp.info.status_val) == qt.SOLVED
    assert int(sp.info.iterations) == int(dense.info.iterations)
    np.testing.assert_allclose(np.asarray(sp.x), np.asarray(dense.x),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(sp.y), np.asarray(dense.y),
                               atol=1e-8)


def test_scaling_parity():
    """Sparse triplet Ruiz == dense Ruiz on identical data."""
    Q, q, A, l, u = random_qp(25, 18, seed=3)
    op = setup_sparse(sps.csr_matrix(Q), q, sps.csr_matrix(A), l, u)
    spd = scale_problem(qt.make_problem(Q, q, A, l, u), 10)
    np.testing.assert_allclose(np.asarray(op.D), np.asarray(spd.scaling.D),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(op.E), np.asarray(spd.scaling.E),
                               rtol=1e-12)
    np.testing.assert_allclose(float(op.cost), float(spd.scaling.c),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(op.q), np.asarray(spd.data.q),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(op.l), np.asarray(spd.data.l),
                               rtol=1e-12)
    # scaled A parity via a matvec
    v = np.random.default_rng(0).standard_normal(25)
    np.testing.assert_allclose(np.asarray(op.Amv(jnp.asarray(v))),
                               np.asarray(spd.data.A @ v), rtol=1e-10)
    # diagQ matches the scaled dense diagonal
    np.testing.assert_allclose(np.asarray(op.diagQ),
                               np.diag(np.asarray(spd.data.Q)), rtol=1e-12)


def test_large_n_solves_to_tolerance():
    """An n=5000 instance solves to 1e-6 without materializing K
    (VERDICT round-1, missing item 1)."""
    rng = np.random.default_rng(7)
    n, m = 5000, 3000
    B = sps.random(n, n, density=2.0 / n, random_state=7, format="csr")
    Q = (B.T @ B + 0.05 * sps.eye(n)).tocsr()
    A = sps.random(m, n, density=4.0 / n, random_state=8, format="csr")
    q = rng.standard_normal(n)
    l, u = -rng.random(m), rng.random(m)
    res = qt.solve_sparse(Q, q, A, l, u)
    assert int(res.info.status_val) == qt.SOLVED
    x, y = np.asarray(res.x), np.asarray(res.y)
    rp = np.max(np.abs(A @ x - np.clip(A @ x + y, l, u)))
    rd = np.max(np.abs(Q @ x + q + A.T @ y))
    assert rp < 1e-6 and rd < 1e-6


def test_primal_infeasible_certificate():
    """The sparse path detects primal infeasibility and returns a valid
    Farkas certificate (termination.c:97-151 semantics)."""
    # x1 + x2 <= 0 with x1 >= 1, x2 >= 1 is infeasible
    Q = sps.eye(2) * 1.0
    q = np.zeros(2)
    A = sps.csr_matrix(np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]))
    l = np.array([-np.inf, 1.0, 1.0])
    u = np.array([0.0, 3.0, 3.0])
    res = qt.solve_sparse(Q, q, A, l, u)
    assert int(res.info.status_val) == qt.PRIMAL_INFEASIBLE
    dy = np.asarray(res.prim_inf_cert)
    assert np.all(np.isfinite(dy)) and np.max(np.abs(dy)) > 0
    # Farkas: A'dy ~ 0 and u'[dy]_+ + l'[dy]_- < 0 on finite bounds
    Ad = np.asarray(A.todense()).T @ dy
    assert np.max(np.abs(Ad)) <= 1e-4 * np.max(np.abs(dy))
    support = (np.where(np.isfinite(u), u, 0.0) @ np.maximum(dy, 0)
               + np.where(np.isfinite(l), l, 0.0) @ np.minimum(dy, 0))
    assert support < 0


def test_warm_start_fewer_iterations():
    Q, q, A, l, u = random_qp(60, 45, seed=5)
    Qs, As = _sparse_of(Q, A)
    cold = qt.solve_sparse(Qs, q, As, l, u)
    warm = qt.solve_sparse(Qs, q, As, l, u, x0=cold.x, y0=cold.y)
    assert int(warm.info.status_val) == qt.SOLVED
    assert int(warm.info.iterations) < int(cold.info.iterations)


def test_dense_input_accepted():
    """solve_sparse accepts plain dense arrays (converted to BCOO)."""
    Q, q, A, l, u = random_qp(15, 10, seed=9)
    res = qt.solve_sparse(Q, q, A, l, u)
    assert int(res.info.status_val) == qt.SOLVED


def test_block_jacobi_preconditioner_banded():
    """Banded K (LISWET-style wedge constraints) stalls under plain Jacobi
    CG but converges under the batched block-Jacobi preconditioner."""
    n = 300
    Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, n)
    q = -(np.sin(4 * np.pi * t) + 0.1 * rng.standard_normal(n))
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
    l = np.zeros(m)
    u = np.full(m, np.inf)
    # newton_direct=False: this test exercises the CG *preconditioner*
    # (the banded pattern would otherwise take the direct path)
    s = qt.Settings(eps_abs=1e-6, max_iter=2000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.02, delta=0.1,
                    newton_direct=False)
    res = qt.solve_sparse(Q, q, A, l, u, settings=s)
    assert int(res.info.status_val) == qt.SOLVED
    x, y = np.asarray(res.x), np.asarray(res.y)
    assert np.max(np.abs(A @ x - np.clip(A @ x + y, l, u))) < 1e-6
    assert np.max(np.abs(Q @ x + q + A.T @ y)) < 1e-6
    # plain jacobi with the same (modest) CG budget fails on this problem —
    # the block preconditioner is what makes it tractable
    s_j = s.replace(precond="jacobi", cg_max_iter=100, max_iter=500)
    res_j = qt.solve_sparse(Q, q, A, l, u, settings=s_j)
    assert int(res_j.info.status_val) != qt.SOLVED


def test_block_jacobi_matches_jacobi_result():
    """Preconditioning changes CG convergence, not the answer: both
    preconditioners give the same solution on a well-conditioned QP."""
    Q, q, A, l, u = random_qp(50, 35, seed=11)
    Qs, As = _sparse_of(Q, A)
    r1 = qt.solve_sparse(Qs, q, As, l, u,
                         settings=qt.Settings(precond="block_jacobi"))
    r2 = qt.solve_sparse(Qs, q, As, l, u,
                         settings=qt.Settings(precond="jacobi"))
    assert int(r1.info.status_val) == int(r2.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               atol=1e-7)


def test_sparse_verbose_and_max_time(capsys):
    """The host driver (verbose table + max_time) works on the sparse
    operator path too."""
    Q, q, A, l, u = random_qp(20, 15, seed=13)
    Qs, As = _sparse_of(Q, A)
    res = qt.solve_sparse(Qs, q, As, l, u,
                          settings=qt.Settings(verbose=True, max_iter=200))
    out = capsys.readouterr().out
    assert int(res.info.status_val) == qt.SOLVED
    assert "res_prim" in out or "iter" in out
    # max_time cap: an impossible deadline returns MAX_TIME_REACHED
    res2 = qt.solve_sparse(Qs, q, As, l, u,
                           settings=qt.Settings(eps_abs=1e-300,
                                                max_time=1e-6))
    assert int(res2.info.status_val) == qt.MAX_TIME_REACHED


def test_sparse_batch_vmap():
    """solve_sparse_batch: lock-step vmapped solving of same-pattern
    sparse instances matches per-instance solves."""
    rng = np.random.default_rng(0)
    n, m, B = 50, 40, 3
    A_pat = sps.random(m, n, density=0.2, random_state=1, format="csr")
    A_pat.data[:] = rng.standard_normal(A_pat.nnz)
    Bm = sps.random(n, n, density=0.1, random_state=2, format="csr")
    Q_pat = (Bm.T @ Bm + 0.1 * sps.eye(n)).tocsr()

    probs = []
    for b in range(B):
        Qb = Q_pat.copy()
        Qb.data = Qb.data * (1 + 0.1 * rng.random(Qb.nnz))
        Ab = A_pat.copy()
        Ab.data = Ab.data + 0.05 * rng.standard_normal(Ab.nnz)
        probs.append((Qb, rng.standard_normal(n), Ab,
                      -np.ones(m), np.ones(m)))

    res = qt.solve_sparse_batch(probs)
    assert res.x.shape == (B, n)
    for b in range(B):
        assert int(res.info.status_val[b]) == qt.SOLVED
        single = qt.solve_sparse(*probs[b])
        np.testing.assert_allclose(np.asarray(res.x[b]),
                                   np.asarray(single.x), atol=1e-8)


def test_mixed_precision_cg_matches_full():
    """cg_dtype='float32' (float32 inner CG + state-dtype iterative
    refinement, ops/cg.pcg_refined) reaches the same 1e-6 KKT accuracy as
    the full-precision CG path."""
    rng = np.random.default_rng(21)
    n, m = 400, 300
    B = sps.random(n, n, density=4.0 / n, random_state=21, format="csr")
    Q = (B.T @ B + 0.1 * sps.eye(n)).tocsr()
    A = sps.random(m, n, density=6.0 / n, random_state=22, format="csr")
    q = rng.standard_normal(n)
    l, u = -rng.random(m), rng.random(m)
    s = qt.Settings(newton_direct=False, mu_min=1e-7)
    full = qt.solve_sparse(Q, q, A, l, u, settings=s)
    mixed = qt.solve_sparse(Q, q, A, l, u,
                            settings=s.replace(cg_dtype="float32"))
    assert int(full.info.status_val) == qt.SOLVED
    assert int(mixed.info.status_val) == qt.SOLVED
    for res in (full, mixed):
        x, y = np.asarray(res.x), np.asarray(res.y)
        rp = np.max(np.abs(A @ x - np.clip(A @ x + y, l, u)))
        rd = np.max(np.abs(Q @ x + q + A.T @ y))
        assert rp < 1e-6 and rd < 1e-6
    np.testing.assert_allclose(np.asarray(mixed.x), np.asarray(full.x),
                               atol=1e-5)


def test_pcg_refined_beats_float32_floor():
    """pcg_refined reaches a residual pure-float32 CG cannot: the inner
    solves run in float32 yet refinement recovers ~state-dtype accuracy."""
    from qpdo_tpu.ops.cg import pcg, pcg_refined

    rng = np.random.default_rng(5)
    n = 200
    M = rng.standard_normal((n, n))
    K = jnp.asarray(M @ M.T / n + 0.5 * np.eye(n))
    rhs = jnp.asarray(rng.standard_normal(n))
    K32 = K.astype(jnp.float32)
    mv = lambda v: K @ v
    mv32 = lambda v: K32 @ v
    dinv = 1.0 / jnp.diag(K)
    dinv32 = dinv.astype(jnp.float32)

    x32, _, _ = pcg(mv32, rhs.astype(jnp.float32), dinv32, 1e-12, 1000)
    rel32 = float(jnp.linalg.norm(rhs - mv(x32.astype(rhs.dtype)))
                  / jnp.linalg.norm(rhs))
    x, rounds, rel = pcg_refined(mv, mv32, rhs, dinv32, 1e-10, 1000, 6,
                                 jnp.float32)
    assert rel32 > 1e-8          # the float32 floor is real
    assert float(rel) <= 1e-10   # refinement breaks through it
    assert int(rounds) >= 2


# ---------------------------------------------------------------------------
# Banded direct Newton backend (operators._banded_solve)
# ---------------------------------------------------------------------------

def _liswet_data(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, n)
    q = -(np.sin(4 * np.pi * t) + 0.1 * rng.standard_normal(n))
    Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
    return Q, q, A, np.zeros(m), np.full(m, np.inf)


def test_banded_detection():
    """Banded patterns get block-tridiagonal maps; scattered ones don't."""
    Q, q, A, l, u = _liswet_data(200)
    op = setup_sparse(Q, q, A, l, u)
    assert op.bd_tmpl is not None
    nb, b = op.bd_tmpl.shape
    assert nb * b >= 200 and b >= 2  # bandwidth 2 pattern
    # scattered random pattern: bandwidth ~ n -> no banded maps
    Qd, qd, Ad, ld, ud = random_qp(40, 30, seed=0)
    op2 = setup_sparse(sps.csr_matrix(Qd), qd, sps.csr_matrix(Ad), ld, ud)
    assert op2.bd_tmpl is None


def test_banded_solve_matches_dense_factorization():
    """_banded_solve solves the exact same K as a dense solve of the
    assembled matrix (the ldlchol/ldlsolveLD_rhs contract,
    cholmod_interface.c:8-30, 98-102)."""
    Q, q, A, l, u = _liswet_data(150, seed=3)
    op = setup_sparse(Q, q, A, l, u)
    assert op.bd_tmpl is not None
    rng = np.random.default_rng(1)
    m, n = A.shape
    mu = 10.0 ** rng.uniform(-6, 0, m)
    active = (rng.random(m) < 0.6).astype(float)
    sigma, rhs = 1e-4, rng.standard_normal(n)
    w = active / mu
    dx = op._banded_solve(jnp.asarray(w), jnp.asarray(sigma),
                          jnp.asarray(rhs), qt.Settings())
    # dense K from the *scaled* operator data
    Ad = np.zeros((m, n))
    ai = np.asarray(op.a_idx)
    Ad[ai[:, 0], ai[:, 1]] = np.asarray(op.a_data)
    Qd = np.zeros((n, n))
    qi = np.asarray(op.q_idx)
    Qd[qi[:, 0], qi[:, 1]] = np.asarray(op.q_data)
    K = Qd + sigma * np.eye(n) + Ad.T @ (w[:, None] * Ad)
    dx_ref = np.linalg.solve(K, rhs)
    np.testing.assert_allclose(np.asarray(dx), dx_ref, atol=1e-9)


def test_banded_path_matches_dense_path():
    """End-to-end: the banded direct path reproduces the dense path's
    trajectory (both are exact Newton solves, so the full-step acceptance
    fires identically)."""
    Q, q, A, l, u = _liswet_data(80, seed=5)
    dense = qt.solve(qt.make_problem(np.asarray(Q.todense()), q,
                                     np.asarray(A.todense()), l, u))
    banded = qt.solve_sparse(Q, q, A, l, u)
    assert int(dense.info.status_val) == qt.SOLVED
    assert int(banded.info.status_val) == qt.SOLVED
    assert int(banded.info.iterations) == int(dense.info.iterations)
    np.testing.assert_allclose(np.asarray(banded.x), np.asarray(dense.x),
                               atol=1e-7)


def test_banded_batch_vmap():
    """solve_sparse_batch on a banded pattern (vmapped scan factorization)."""
    probs = [
        _liswet_data(60, seed=100 + s) for s in range(3)
    ]
    res = qt.solve_sparse_batch(probs)
    for b in range(3):
        assert int(res.info.status_val[b]) == qt.SOLVED
        single = qt.solve_sparse(*probs[b])
        np.testing.assert_allclose(np.asarray(res.x[b]),
                                   np.asarray(single.x), atol=1e-8)


def test_full_step_acceptance_gating():
    """newton_full_step only fires with exact Newton directions: the CG
    path must report newton_exact False, the banded path True."""
    Q, q, A, l, u = _liswet_data(120, seed=7)
    op = setup_sparse(Q, q, A, l, u)
    assert op.newton_exact(qt.Settings()) is True
    assert op.newton_exact(qt.Settings(newton_direct=False)) is False
    Qd, qd, Ad, ld, ud = random_qp(30, 20, seed=1)
    op2 = setup_sparse(sps.csr_matrix(Qd), qd, sps.csr_matrix(Ad), ld, ud)
    assert bool(op2.newton_exact(qt.Settings())) is False
    # opt-out reproduces the pure exact-linesearch stepping
    r_ref = qt.solve(qt.make_problem(Qd, qd, Ad, ld, ud),
                     qt.Settings(newton_full_step=False))
    assert int(r_ref.info.status_val) == qt.SOLVED


def test_cyclic_reduction_matches_scan():
    """Block cyclic reduction (the TPU-native O(log nb)-depth banded
    factorization) returns the exact same directions as the sequential
    scan Cholesky, across odd/even/tiny block counts."""
    rng = np.random.default_rng(9)
    for n in (17, 24, 150, 333):
        Q, q, A, l, u = _liswet_data(n, seed=n)
        op = setup_sparse(Q, q, A, l, u)
        assert op.bd_tmpl is not None
        m = A.shape[0]
        mu = 10.0 ** rng.uniform(-6, 0, m)
        active = (rng.random(m) < 0.6).astype(float)
        w = jnp.asarray(active / mu)
        sigma = jnp.asarray(1e-4)
        rhs = jnp.asarray(rng.standard_normal(n))
        dx_scan = op._banded_solve(w, sigma, rhs,
                                   qt.Settings(banded_algo="scan"))
        dx_cr = op._banded_solve(w, sigma, rhs,
                                 qt.Settings(banded_algo="cr"))
        np.testing.assert_allclose(np.asarray(dx_cr), np.asarray(dx_scan),
                                   atol=1e-9)


def test_cyclic_reduction_end_to_end():
    """Full solve on the banded path with banded_algo='cr' reproduces the
    scan trajectory (both exact, so identical iteration counts)."""
    Q, q, A, l, u = _liswet_data(90, seed=11)
    r_scan = qt.solve_sparse(Q, q, A, l, u,
                             settings=qt.Settings(banded_algo="scan"))
    r_cr = qt.solve_sparse(Q, q, A, l, u,
                           settings=qt.Settings(banded_algo="cr"))
    assert int(r_scan.info.status_val) == qt.SOLVED
    assert int(r_cr.info.status_val) == qt.SOLVED
    assert int(r_cr.info.iterations) == int(r_scan.info.iterations)
    np.testing.assert_allclose(np.asarray(r_cr.x), np.asarray(r_scan.x),
                               atol=1e-8)


def test_precond_dtype_float32():
    """precond_dtype='float32' factors the block-Jacobi + coarse
    preconditioner in float32 (the TPU-safe mode — pure-f64 batched
    Cholesky crashes the axon device): CG steering changes, the answer
    does not."""
    Q, q, A, l, u = random_qp(50, 35, seed=11)
    Qs, As = _sparse_of(Q, A)
    r1 = qt.solve_sparse(Qs, q, As, l, u,
                         settings=qt.Settings(precond_dtype="float32"))
    r2 = qt.solve_sparse(Qs, q, As, l, u, settings=qt.Settings())
    assert int(r1.info.status_val) == int(r2.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               atol=1e-7)


def test_sparse_tpu_safe_config():
    """The TPU-deployment sparse config — hybrid f32 warmup + float32 CG
    inner solves + float32 preconditioner factorization (no f64 Cholesky
    anywhere) — still reaches 1e-6, oracle-verified."""
    rng = np.random.default_rng(3)
    n, m = 300, 220
    B = sps.random(n, n, density=8.0 / n, random_state=3, format="csr")
    Qs = (B.T @ B + 0.5 * sps.eye(n)).tocsr()
    As = sps.random(m, n, density=8.0 / n, random_state=4, format="csr")
    q = rng.standard_normal(n)
    l, u = -rng.random(m), rng.random(m)
    st = qt.Settings(eps_abs=1e-6, newton_direct=False, mu_min=1e-7,
                     hybrid_warmup=True, warmup_eps=1e-3,
                     cg_dtype="float32", precond_dtype="float32")
    res = qt.solve_sparse(Qs, q, As, l, u, settings=st, dtype="float64")
    assert int(res.info.status_val) == qt.SOLVED
    x, y = np.asarray(res.x), np.asarray(res.y)
    rp = np.max(np.abs(As @ x - np.clip(As @ x + y, l, u)))
    rd = np.max(np.abs(Qs @ x + q + As.T @ y))
    assert max(rp, rd) <= 1.1e-6


def test_sparse_batch_warm_start():
    """solve_sparse_batch accepts (B, n)/(B, m) warm starts; warm
    re-solves of the same fleet take fewer iterations."""
    rng = np.random.default_rng(21)
    n, m, B = 40, 30, 3
    pat_Q = sps.random(n, n, density=0.2, random_state=21, format="csr")
    Qp = (pat_Q.T @ pat_Q + 0.5 * sps.eye(n)).tocsr()
    Ap = sps.random(m, n, density=0.3, random_state=22, format="csr")
    probs = []
    for b in range(B):
        Qb = Qp.copy()
        Qb.data = Qb.data * (1.0 + 0.01 * b)
        probs.append((Qb, rng.standard_normal(n), Ap,
                      -np.ones(m), np.ones(m)))
    cold = qt.solve_sparse_batch(probs, qt.Settings())
    assert np.all(np.asarray(cold.info.status_val) == qt.SOLVED)
    warm = qt.solve_sparse_batch(probs, qt.Settings(),
                                 x0=np.asarray(cold.x),
                                 y0=np.asarray(cold.y))
    assert np.all(np.asarray(warm.info.status_val) == qt.SOLVED)
    assert (np.asarray(warm.info.iterations).mean()
            < np.asarray(cold.info.iterations).mean())


def test_sparse_batch_mixed_patterns():
    """Mixed sparsity patterns batch via the union-pattern rebuild
    (solver.sparse.union_triplets): per-instance results match individual
    solves bitwise-closely and union zeros do not perturb anything."""
    rng = np.random.default_rng(33)
    n, m, B = 40, 30, 3
    probs = []
    for b in range(B):
        Bm = sps.random(n, n, density=0.08 + 0.04 * b,
                        random_state=100 + b, format="csr")
        Qb = (Bm.T @ Bm + 0.2 * sps.eye(n)).tocsr()
        Ab = sps.random(m, n, density=0.15 + 0.05 * b,
                        random_state=200 + b, format="csr")
        Ab.data[:] = rng.standard_normal(Ab.nnz)
        probs.append((Qb, rng.standard_normal(n), Ab,
                      -np.ones(m), np.ones(m)))
    # sanity: the patterns genuinely differ
    assert len({p[0].nnz for p in probs}) > 1

    res = qt.solve_sparse_batch(probs)
    assert res.x.shape == (B, n)
    for b in range(B):
        assert int(res.info.status_val[b]) == qt.SOLVED
        single = qt.solve_sparse(*probs[b])
        np.testing.assert_allclose(np.asarray(res.x[b]),
                                   np.asarray(single.x), atol=1e-7)
        np.testing.assert_allclose(np.asarray(res.y[b]),
                                   np.asarray(single.y), atol=1e-7)


def test_union_triplets_roundtrip():
    from qpdo_tpu.solver.sparse import union_triplets

    M1 = sps.csr_matrix(np.array([[1.0, 0.0], [0.0, 2.0]]))
    M2 = sps.csr_matrix(np.array([[0.0, 3.0], [0.0, 4.0]]))
    datas, idx, shape = union_triplets([M1, M2], jnp.float64)
    assert tuple(shape) == (2, 2)
    idx = np.asarray(idx)
    # union = {(0,0),(0,1),(1,1)} in row-major order
    np.testing.assert_array_equal(idx, [[0, 0], [0, 1], [1, 1]])
    np.testing.assert_allclose(np.asarray(datas[0]), [1.0, 0.0, 2.0])
    np.testing.assert_allclose(np.asarray(datas[1]), [0.0, 3.0, 4.0])


def test_sparse_batch_sharded_mesh():
    """mesh= shards the sparse fleet's batch axis over devices; results
    match the unsharded batch."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(44)
    n, m, B = 30, 24, 8
    pat = sps.random(n, n, density=0.15, random_state=44, format="csr")
    Qp = (pat.T @ pat + 0.3 * sps.eye(n)).tocsr()
    Ap = sps.random(m, n, density=0.25, random_state=45, format="csr")
    Ap.data[:] = rng.standard_normal(Ap.nnz)
    probs = []
    for b in range(B):
        Qb = Qp.copy()
        Qb.data = Qb.data * (1.0 + 0.02 * b)
        probs.append((Qb, rng.standard_normal(n), Ap,
                      -np.ones(m), np.ones(m)))

    plain = qt.solve_sparse_batch(probs)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("batch",))
    sharded = qt.solve_sparse_batch(probs, mesh=mesh)
    assert np.all(np.asarray(sharded.info.status_val) == qt.SOLVED)
    np.testing.assert_allclose(np.asarray(sharded.x), np.asarray(plain.x),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(sharded.y), np.asarray(plain.y),
                               atol=1e-9)


def test_union_triplets_accumulates_duplicates():
    """Duplicate (i, j) entries in one instance sum (COO semantics) rather
    than last-write-wins."""
    from qpdo_tpu.solver.sparse import union_triplets

    dup = (np.array([1.0, 2.0, 5.0]),
           np.array([[0, 0], [0, 0], [1, 1]], np.int32), (2, 2))
    other = sps.csr_matrix(np.array([[0.0, 7.0], [0.0, 0.0]]))
    datas, idx, shape = union_triplets([dup, other], jnp.float64)
    np.testing.assert_array_equal(np.asarray(idx), [[0, 0], [0, 1], [1, 1]])
    np.testing.assert_allclose(np.asarray(datas[0]), [3.0, 0.0, 5.0])
    np.testing.assert_allclose(np.asarray(datas[1]), [0.0, 7.0, 0.0])


def test_sparse_heterogeneous_fleet():
    """Mixed-size sparse fleet: padded lanes are inert — each member's
    sliced result matches its individual solve and the KKT oracle."""
    rng = np.random.default_rng(55)
    specs = [(20, 14), (33, 25), (27, 40)]
    probs = []
    for i, (n, m) in enumerate(specs):
        Bm = sps.random(n, n, density=0.2, random_state=700 + i,
                        format="csr")
        Q = (Bm.T @ Bm + 0.4 * sps.eye(n)).tocsr()
        A = sps.random(m, n, density=0.3, random_state=800 + i,
                       format="csr")
        A = A + sps.csr_matrix((rng.standard_normal(m),
                                (np.arange(m), rng.integers(0, n, m))),
                               shape=(m, n))
        probs.append((Q, rng.standard_normal(n), A,
                      -np.ones(m), np.ones(m)))

    results = qt.solve_sparse_heterogeneous(probs)
    assert len(results) == 3
    for (n, m), (Q, q, A, l, u), res in zip(specs, probs, results):
        assert res.x.shape == (n,) and res.y.shape == (m,)
        assert int(res.info.status_val) == qt.SOLVED
        x, y = np.asarray(res.x), np.asarray(res.y)
        Ax = A @ x
        rp = np.abs(Ax - np.clip(Ax + y, l, u)).max()
        rd = np.abs(Q @ x + q + A.T @ y).max()
        assert rp <= 1e-6 and rd <= 1e-6
        single = qt.solve_sparse(Q, q, A, l, u)
        # padding + union may alter the Newton backend; both solutions
        # are eps-valid, so pin loosely (the oracle above is the gate)
        np.testing.assert_allclose(x, np.asarray(single.x), atol=1e-4)


def test_ell_matvecs_match_scipy(monkeypatch):
    """ELL (padded-row gather) matvecs agree with scipy to f64 roundoff,
    including empty rows/columns and duplicate-free random patterns.
    (QPDO_ELL=1 forces the TPU path on this CPU run — the backend gate
    normally keeps CPU on the faster scatter path.)"""
    monkeypatch.setenv("QPDO_ELL", "1")
    rng = np.random.default_rng(77)
    for trial in range(5):
        n = int(rng.integers(10, 120))
        m = int(rng.integers(5, 150))
        B = sps.random(n, n, density=0.1, random_state=int(trial))
        Q = (B.T @ B + 0.5 * sps.eye(n)).tocsr()
        A = sps.random(m, n, density=0.15, random_state=100 + trial,
                       format="csr")
        A[rng.integers(0, m)] = 0.0  # an empty row
        A.eliminate_zeros()
        op = setup_sparse(Q, rng.standard_normal(n), A,
                          -np.ones(m), np.ones(m), 0.0, scaling_iters=0,
                          dtype="float64")
        assert op.ellA is not None and op.ellAt is not None \
            and op.ellQ is not None
        x = rng.standard_normal(n)
        y = rng.standard_normal(m)
        np.testing.assert_allclose(np.asarray(op.Qmv(jnp.asarray(x))),
                                   Q @ x, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.Amv(jnp.asarray(x))),
                                   A @ x, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.Atmv(jnp.asarray(y))),
                                   A.T @ y, rtol=1e-12, atol=1e-12)
        a2 = op.Amv2(jnp.asarray(x), jnp.asarray(x * 2))
        np.testing.assert_allclose(np.asarray(a2[1]), A @ (2 * x),
                                   rtol=1e-12, atol=1e-12)
        t2 = op.Atmv2(jnp.asarray(y), jnp.asarray(-y))
        np.testing.assert_allclose(np.asarray(t2[1]), A.T @ (-y),
                                   rtol=1e-12, atol=1e-12)
        # diag_K gather form vs direct computation
        mu = jnp.asarray(rng.random(m) + 0.1)
        act = jnp.asarray((rng.random(m) < 0.5).astype(np.float64))
        d = np.asarray(op.diag_K(act, mu, jnp.asarray(0.3), True))
        w = np.asarray(act) / np.asarray(mu)
        d_ref = Q.diagonal() + 0.3 + np.asarray(
            (A.multiply(A)).T @ w).ravel()
        np.testing.assert_allclose(d, d_ref, rtol=1e-12, atol=1e-12)


def test_ell_fallback_on_dense_row(monkeypatch):
    """A pattern with one dense row exceeds the ELL width cap for A (rows)
    but keeps the other directions; results match scipy either way."""
    monkeypatch.setenv("QPDO_ELL", "1")
    rng = np.random.default_rng(3)
    n, m = 300, 40
    A = sps.random(m, n, density=3.0 / n, random_state=9, format="lil")
    A[0, :] = 1.0  # dense row: K for Amv = n = 300 > cap 128
    A = A.tocsr()
    Q = sps.eye(n, format="csr")
    op = setup_sparse(Q, rng.standard_normal(n), A, -np.ones(m),
                      np.ones(m), 0.0, scaling_iters=0, dtype="float64")
    assert op.ellA is None          # width cap exceeded
    x = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(op.Amv(jnp.asarray(x))), A @ x,
                               rtol=1e-12, atol=1e-12)


def test_ell_end_to_end_solve(monkeypatch):
    """Full sparse solve on the forced ELL path: converges and passes the
    KKT oracle (fp summation order differs from the scatter path, so the
    trajectory may differ — the oracle is the contract)."""
    monkeypatch.setenv("QPDO_ELL", "1")
    rng = np.random.default_rng(21)
    n, m = 300, 220
    B = sps.random(n, n, density=4.0 / n, random_state=6, format="csr")
    Q = (B.T @ B + 0.1 * sps.eye(n)).tocsr()
    A = sps.random(m, n, density=6.0 / n, random_state=7, format="csr")
    q = rng.standard_normal(n)
    l, u = -rng.random(m), rng.random(m)
    res = qt.solve_sparse(Q, q, A, l, u,
                          settings=qt.Settings(newton_direct=False,
                                               mu_min=1e-7))
    assert int(res.info.status_val) == qt.SOLVED
    x, y = np.asarray(res.x), np.asarray(res.y)
    Ax = A @ x
    assert np.max(np.abs(Ax - np.clip(Ax + y, l, u))) < 1e-6
    assert np.max(np.abs(Q @ x + q + A.T @ y)) < 1e-6


def test_ell_fleet_union_pattern(monkeypatch):
    """Forced-ELL mixed-pattern fleet: the pattern-only gather/mask maps
    broadcast under vmap while values stack — per-instance results match
    per-instance solves and the oracle."""
    monkeypatch.setenv("QPDO_ELL", "1")
    rng = np.random.default_rng(13)
    n, m, B = 60, 45, 3
    probs = []
    for b in range(B):
        Bm = sps.random(n, n, density=0.15, random_state=50 + b,
                        format="csr")
        Qb = (Bm.T @ Bm + 0.3 * sps.eye(n)).tocsr()
        Ab = sps.random(m, n, density=0.2, random_state=80 + b,
                        format="csr")
        Ab.data[:] = rng.standard_normal(Ab.nnz)
        probs.append((Qb, rng.standard_normal(n), Ab,
                      -np.ones(m), np.ones(m)))
    res = qt.solve_sparse_batch(probs)  # mixed patterns -> union rebuild
    for b in range(B):
        assert int(res.info.status_val[b]) == qt.SOLVED
        Qb, qb, Ab, lb, ub = probs[b]
        x, y = np.asarray(res.x[b]), np.asarray(res.y[b])
        Ax = Ab @ x
        assert np.max(np.abs(Ax - np.clip(Ax + y, lb, ub))) < 1e-6
        assert np.max(np.abs(Qb @ x + qb + Ab.T @ y)) < 1e-6


def test_kkt_dtype_f32_cache_honesty_on_stressed_scale():
    """Regression (round 3): with kkt_dtype='float32' on the sparse path,
    the Qx-cache increments must stay exact — reduced-precision cache
    matvecs silently drifted the internal residual accounting on
    scale-stressed data (internal rd 1e-8 vs true 1.4e-3, CVXQP1S).  The
    host-side oracle is the contract."""
    rng = np.random.default_rng(5)
    n, m = 100, 150
    M = rng.standard_normal((n, n))
    Q = sps.csr_matrix(M @ M.T / n + 0.1 * np.eye(n))
    A = sps.csr_matrix(rng.standard_normal((m, n)))
    q = rng.standard_normal(n)
    l, u = -rng.random(m), rng.random(m)
    # scale stress: rows/cols spanning ~6 decades (mm_like apply_scale_stress)
    rs = 10.0 ** rng.uniform(-3, 3, m)
    cs = 10.0 ** rng.uniform(-3, 3, n)
    A = sps.diags(rs) @ A @ sps.diags(cs)
    Q = sps.diags(cs) @ Q @ sps.diags(cs)
    q = q * cs
    l, u = l * rs, u * rs
    s = qt.Settings(eps_abs=1e-6, max_iter=5000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.02, delta=0.1, ruiz_kkt=True,
                    kkt_dtype="float32", mu_min=1e-7, refine_steps=3,
                    cg_dtype="float32", precond_dtype="float32")
    res = qt.solve_sparse(Q.tocsr(), q, A.tocsr(), l, u, settings=s)
    assert int(res.info.status_val) == qt.SOLVED
    x, y = np.asarray(res.x), np.asarray(res.y)
    Ax = A @ x
    rp = np.max(np.abs(Ax - np.clip(Ax + y, l, u)))
    rd = np.max(np.abs(Q @ x + q + A.T @ y))
    # the internal claim and the true residual must agree (10x-eps oracle)
    assert rp < 1e-5 and rd < 1e-5


def _liswet(n, d):
    """min 0.5||x - d||^2  s.t.  x_i - 2 x_{i+1} + x_{i+2} >= 0
    (examples/continuation.py) — the banded active-set-wavefront family."""
    Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
    return Q, -d, A, np.zeros(m), np.full(m, np.inf)


def test_cr_gated_fallback_survives_level704_conditioning():
    """Regression pin for RESULTS.md "level-704": float32 cyclic
    reduction suffers catastrophic Schur-update cancellation at
    cond(K) ~ 1e7 on specific active-set configurations (at ANY depth,
    scripts/cr_traj_diag.py) — the accuracy-gated scan fallback
    (Settings.banded_cr_fallback_rtol) must carry the solve anyway,
    matching the scan iteration class.  This exact configuration
    (aggressive ladder schedule, mu_min=1e-7, kkt_dtype=float32,
    banded_algo="cr") diverged to rd ~ 36-1e12 before round 4."""
    rng = np.random.default_rng(42)
    nlvl = 704
    t = np.linspace(0, 1, nlvl)
    d = np.sin(4 * np.pi * t) + 0.1 * rng.standard_normal(nlvl)
    Q, q, A, l, u = _liswet(nlvl, np.interp(t, t, d))
    s = qt.Settings(eps_abs=1e-6, max_iter=3000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.2, delta=1e-4, theta=0.9,
                    kkt_dtype="float32", mu_min=1e-7, refine_steps=3,
                    banded_algo="cr")
    res = qt.solve_sparse(Q, q, A, l, u, settings=s)
    assert int(res.info.status_val) == qt.SOLVED
    # scan class is ~940 iterations; the gated CR must not crawl
    assert int(res.info.iterations) < 1500
    x, y = np.asarray(res.x), np.asarray(res.y)
    Ax = A @ x
    assert np.max(np.abs(Ax - np.clip(Ax + y, l, u))) < 1e-5
    assert np.max(np.abs(Q @ x + q + A.T @ y)) < 1e-5


def test_cr_without_gate_warns_on_aggressive_mu():
    """validate_settings must flag the documented-fatal combo (round-3
    verdict item 5): float32 CR with the accuracy gate disabled and an
    aggressive mu floor cannot be configured silently."""
    import warnings as _w

    from qpdo_tpu.validate import UnsafeSettingsWarning, validate_settings

    s = qt.Settings(kkt_dtype="float32", mu_min=1e-7, banded_algo="cr",
                    banded_cr_fallback_rtol=0.0, banded_pcg_refine=0)
    with pytest.warns(UnsafeSettingsWarning, match="cyclic reduction"):
        validate_settings(s)
    # the default configuration (gate + round-4 stability defaults on)
    # must be warning-free — Jacobi equilibration removes the CR
    # cancellation class and PCG refinement restores state accuracy
    s_ok = qt.Settings(kkt_dtype="float32", mu_min=1e-7)
    with _w.catch_warnings():
        _w.simplefilter("error", UnsafeSettingsWarning)
        validate_settings(s_ok)


def test_f32_kkt_with_tiny_mu_warns():
    """kkt_dtype=float32 + mu_min < 1e-7 with the PCG refinement forced
    OFF is the documented divergence class (a bare float32 factor cannot
    carry cond ~ 1/mu beyond ~1e7).  With the round-4 default
    (kkt_pcg_refine=-1 auto) the combo is SAFE — Krylov refinement
    engages exactly in this regime — so the default must be
    warning-free, including at the reference's own mu_min=1e-9."""
    import warnings as _w

    from qpdo_tpu.validate import UnsafeSettingsWarning, validate_settings

    with pytest.warns(UnsafeSettingsWarning, match="mu_min"):
        validate_settings(qt.Settings(kkt_dtype="float32",
                                      kkt_pcg_refine=0))  # mu_min 1e-9
    with _w.catch_warnings():
        _w.simplefilter("error", UnsafeSettingsWarning)
        validate_settings(qt.Settings(kkt_dtype="float32"))  # auto PCG


def test_banded_stressed_conditioning_direction_accuracy():
    """Round-4 regression: at cond(K) ~ 1/mu_min with kkt_dtype=float32
    the banded direct solve must still deliver state-accurate directions.
    The f32 factor alone floors at ~5e-2 relative error there and
    Richardson refinement cannot contract (cond*eps32 > 1) — the fix is
    symmetric Jacobi equilibration + PCG refinement preconditioned by
    the f32 factor (banded_jacobi_scale/banded_pcg_refine).  Pin both:
    the default path reaches 1e-8, the legacy Richardson mode does not."""
    Q, q, A, l, u = _liswet_data(704, seed=5)
    op = setup_sparse(Q, q, A, l, u)
    assert op.bd_tmpl is not None
    rng = np.random.default_rng(2)
    m, n = A.shape
    # the aggressive-mu active set: most rows at mu_min=1e-7, rest soft
    mu = np.where(rng.random(m) < 0.7, 1e-7, 1.0)
    active = (rng.random(m) < 0.8).astype(float)
    sigma, rhs = 1e-4, rng.standard_normal(n)
    w = active / mu

    Ad = np.zeros((m, n))
    ai = np.asarray(op.a_idx)
    Ad[ai[:, 0], ai[:, 1]] = np.asarray(op.a_data)
    Qd = np.zeros((n, n))
    qi = np.asarray(op.q_idx)
    Qd[qi[:, 0], qi[:, 1]] = np.asarray(op.q_data)
    K = Qd + sigma * np.eye(n) + Ad.T @ (w[:, None] * Ad)
    assert np.linalg.cond(K) > 1e6  # the stressed regime is real

    def rel_res(settings):
        dx = np.asarray(op._banded_solve(
            jnp.asarray(w), jnp.asarray(sigma), jnp.asarray(rhs), settings))
        return np.linalg.norm(rhs - K @ dx) / np.linalg.norm(rhs)

    for algo in ("scan", "cr"):
        base = qt.Settings(kkt_dtype="float32", banded_algo=algo)
        r_new = rel_res(base)
        assert r_new < 1e-7, f"{algo}: PCG-refined rel res {r_new:.2e}"
        # escalation off too: the round-4 state-dtype escalation would
        # rescue the legacy path (its whole point), erasing the contrast
        # this regression pins
        r_legacy = rel_res(base.replace(banded_pcg_refine=0,
                                        refine_steps=3,
                                        banded_escalate_rtol=0.0))
        assert r_legacy > 10 * r_new, (
            f"{algo}: legacy Richardson unexpectedly matched "
            f"({r_legacy:.2e} vs {r_new:.2e}) — the regression test "
            f"lost its teeth")


def test_handrolled_block_linalg_parity():
    """The hand-rolled block Cholesky/substitutions (no lax.linalg — the
    TPU-safe float64 escalation path, operators._chol_unrolled et al.)
    match the native implementations to machine precision."""
    from qpdo_tpu.operators import (_chol_unrolled, _tri_solve_unrolled,
                                    _tri_solve_unrolled_mat,
                                    SparseOperator)
    rng = np.random.default_rng(0)
    for b in (1, 2, 4, 8):
        M = rng.standard_normal((5, b, b))
        D = jnp.asarray(M @ np.swapaxes(M, -1, -2) + b * np.eye(b))
        L, Lref = _chol_unrolled(D), jnp.linalg.cholesky(D)
        np.testing.assert_allclose(L, Lref, atol=1e-12)
        r = jnp.asarray(rng.standard_normal((5, b)))
        for trans in (False, True):
            x = _tri_solve_unrolled(L, r, trans=trans)
            xr = jax.scipy.linalg.solve_triangular(
                Lref, r[..., None], lower=True, trans=int(trans))[..., 0]
            np.testing.assert_allclose(x, xr, atol=1e-12)
        B = jnp.asarray(rng.standard_normal((5, b, 3)))
        np.testing.assert_allclose(
            _tri_solve_unrolled_mat(L, B),
            jax.scipy.linalg.solve_triangular(Lref, B, lower=True),
            atol=1e-12)

    # block-tridiagonal solve parity: hand-rolled scan vs native scan
    nb, b = 9, 4
    M = rng.standard_normal((nb, b, b))
    D = jnp.asarray(M @ np.swapaxes(M, -1, -2) + 10 * b * np.eye(b))
    E = jnp.asarray(0.3 * rng.standard_normal((nb - 1, b, b)))
    rb = jnp.asarray(rng.standard_normal((nb, b)))
    np.testing.assert_allclose(
        SparseOperator._banded_factor_scan_hr(D, E)(rb),
        SparseOperator._banded_factor_scan(D, E)(rb), atol=1e-9)


def test_banded_escalation_beyond_f32_breakdown():
    """Round-4 regression for the mu <= 1e-8 explosion class: at
    w = 1/mu = 1e9 the equilibrated KKT's spectral condition exceeds
    1/eps32, the float32 block Cholesky mathematically breaks down (NaN
    factor), and pre-fix the NaN-guard returned dx = 0 — turning the
    dual update into a +rp/mu staircase (duals at 1e8 within 300
    iterations, logs/liswet5625_isolate_mu1e9.log).  The state-dtype
    escalation (Settings.banded_escalate_rtol) must catch the failed
    gate and deliver a direction at the f64-factor error class, exactly
    the robustness of the reference's f64 LDL' at its own mu_min=1e-9
    default (cholmod_interface.c:8-30, constants.h:55)."""
    Q, q, A, l, u = _liswet_data(800, seed=7)
    op = setup_sparse(Q, q, A, l, u)
    assert op.bd_tmpl is not None
    m, n = A.shape
    w = jnp.full((m,), 1e9)            # every row active at mu = 1e-9
    sigma = jnp.asarray(1e-7)
    rhs = jnp.asarray(np.random.default_rng(3).standard_normal(n))

    s = qt.Settings(kkt_dtype="float32")
    dx = np.asarray(op._banded_solve(w, sigma, rhs, s))
    r = np.asarray(rhs - (op.Qmv(jnp.asarray(dx))
                          + op.Atmv(w * op.Amv(jnp.asarray(dx)))
                          + sigma * jnp.asarray(dx)))
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(rhs))
    assert np.any(dx != 0), "escalation must not collapse to the NaN-guard"
    assert rel < 1e-5, f"escalated direction rel res {rel:.2e}"

    # without escalation the f32 factor NaNs and the guard zeroes dx —
    # pin the failure mode so this test keeps its teeth
    dx0 = np.asarray(op._banded_solve(
        w, sigma, rhs, s.replace(banded_escalate_rtol=0.0)))
    assert np.all(dx0 == 0)


def test_solve_f32_kkt_at_reference_mu_min_banded():
    """End-to-end: a banded LISWET solve with kkt_dtype='float32' at the
    reference's own mu_min=1e-9 default (constants.h:55) must stay sane
    — pre-fix the duals exploded to 1e8 (the staircase class).  Small n
    keeps it fast; the acceptance is sane residuals + no dual blowup,
    not full convergence (cold LISWET convergence is slow by nature)."""
    Q, q, A, l, u = _liswet_data(600, seed=11)
    s = qt.Settings(eps_abs=1e-6, max_iter=1500, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.2, delta=1e-4, theta=0.9,
                    kkt_dtype="float32", mu_min=1e-9, refine_steps=3,
                    hybrid_warmup=False)
    r = qt.solve_sparse(Q, q, A, l, u, settings=s)
    x, y = np.asarray(r.x), np.asarray(r.y)
    Ax = A @ x
    rp = float(np.max(np.abs(Ax - np.clip(Ax + y, l, u))))
    rd = float(np.max(np.abs(Q @ x + q + A.T @ y)))
    assert np.max(np.abs(y)) < 1e5, "dual explosion (the staircase class)"
    assert rd < 1e-4 and rp < 1e-2, (rp, rd)


def test_static_robust_gates_trace_time():
    """Settings.robust_gate_auto (round-5): the banded robustness
    branches are COMPILED ONLY where their failure regime is reachable —
    kkt_dtype and mu_min are static, so the decision is trace-time and
    batched fleets at sane mu floors carry no vmap select tax
    (+35%/batch measured, RESULTS.md).  Pinned by jaxpr identity: with
    the gate statically off, the program must be bit-identical to the
    explicitly-disabled one."""
    Q, q, A, l, u = _liswet_data(200, seed=2)
    op = setup_sparse(Q, q, A, l, u)
    assert op.bd_tmpl is not None
    m, n = A.shape
    w = jnp.full((m,), 1e5)
    sigma = jnp.asarray(1e-3)
    rhs = jnp.asarray(np.random.default_rng(1).standard_normal(n))

    def jaxpr(settings):
        return str(jax.make_jaxpr(
            lambda wv, sv, rv: op._banded_solve(wv, sv, rv, settings))(
                w, sigma, rhs))

    base7 = qt.Settings(kkt_dtype="float32", mu_min=1e-7)
    # mu_min = 1e-7: escalation cannot fire (f32+PCG is proven there) —
    # same program as the explicit opt-out
    assert jaxpr(base7) == jaxpr(base7.replace(banded_escalate_rtol=0.0))
    # ...but robust_gate_auto=False restores the always-compiled branch
    assert jaxpr(base7.replace(robust_gate_auto=False)) != jaxpr(base7)
    # mu_min = 1e-5: the CR cancellation class is unreachable too — both
    # branches out of the program
    base5 = qt.Settings(kkt_dtype="float32", mu_min=1e-5, banded_algo="cr")
    assert jaxpr(base5) == jaxpr(base5.replace(
        banded_escalate_rtol=0.0, banded_cr_fallback_rtol=0.0))
    # mu_min = 1e-9 (the reference default): full robustness stays in
    base9 = qt.Settings(kkt_dtype="float32", mu_min=1e-9)
    assert jaxpr(base9) != jaxpr(base9.replace(banded_escalate_rtol=0.0))
