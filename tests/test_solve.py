"""End-to-end solve tests against the KKT oracle.

These encode the reference's acceptance criteria: solve random convex QPs to
eps_abs with independently recomputed KKT residuals (examples/demo_mex.m)
and warm-start convergence in fewer iterations (demo_mex.m:45-56).
"""

import numpy as np
import pytest

import qpdo_tpu as qt

from utils import kkt_residuals, random_qp

EPS = 1e-6


def _solve(Q, q, A, l, u, settings=None, **kw):
    problem = qt.make_problem(Q, q, A, l, u)
    return qt.solve(problem, settings or qt.Settings(verbose=False), **kw)


@pytest.mark.parametrize("n,m,seed", [(20, 15, 0), (50, 80, 1), (200, 100, 2)])
def test_random_qp_solved(n, m, seed):
    Q, q, A, l, u = random_qp(n, m, seed=seed)
    res = _solve(Q, q, A, l, u)
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
    assert rp <= EPS
    assert rd <= EPS


def test_demo_style_sparse_illconditioned():
    """n=200, m=100, density 0.1, rcond 1e-3 — the demo_mex.m problem class."""
    Q, q, A, l, u = random_qp(200, 100, seed=123456, density=0.1, rcond=1e-3)
    res = _solve(Q, q, A, l, u)
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
    assert rp <= EPS and rd <= EPS


def test_singular_Q():
    """Q PSD singular: the Newton system stays solvable by construction."""
    rng = np.random.default_rng(3)
    n, m = 30, 20
    B = rng.standard_normal((n, n // 2))
    Q = B @ B.T  # rank n/2
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    l = -np.ones(m)
    u = np.ones(m)
    res = _solve(Q, q, A, l, u)
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
    assert rp <= EPS and rd <= EPS


def test_equality_constraints():
    Q, q, A, l, u = random_qp(30, 20, seed=4, eq_frac=0.5)
    res = _solve(Q, q, A, l, u)
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
    assert rp <= EPS and rd <= EPS


def test_infinite_bounds():
    Q, q, A, l, u = random_qp(25, 40, seed=5)
    l[::3] = -np.inf
    u[1::3] = np.inf
    res = _solve(Q, q, A, l, u)
    assert int(res.info.status_val) == qt.SOLVED
    lc = np.clip(l, -qt.QPDO_INFTY, qt.QPDO_INFTY)
    uc = np.clip(u, -qt.QPDO_INFTY, qt.QPDO_INFTY)
    rp, rd = kkt_residuals(Q, q, A, lc, uc, res.x, res.y)
    assert rp <= EPS and rd <= EPS


def test_unconstrained_inactive():
    """All constraints slack at the optimum -> pure proximal Newton path."""
    rng = np.random.default_rng(6)
    n, m = 15, 10
    Q = np.eye(n)
    q = rng.standard_normal(n) * 0.01
    A = rng.standard_normal((m, n))
    l = -1e3 * np.ones(m)
    u = 1e3 * np.ones(m)
    res = _solve(Q, q, A, l, u)
    assert int(res.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(np.asarray(res.x), -q, atol=1e-6)


def test_warm_start_fewer_iterations():
    """demo_mex.m:45-56: warm start from a perturbed solution converges in
    fewer iterations than the cold solve."""
    Q, q, A, l, u = random_qp(60, 40, seed=7)
    res_cold = _solve(Q, q, A, l, u)
    assert int(res_cold.info.status_val) == qt.SOLVED
    rng = np.random.default_rng(8)
    x0 = np.asarray(res_cold.x) + 1e-3 * rng.standard_normal(60)
    y0 = np.asarray(res_cold.y) + 1e-3 * rng.standard_normal(40)
    res_warm = _solve(Q, q, A, l, u, x0=x0, y0=y0)
    assert int(res_warm.info.status_val) == qt.SOLVED
    assert int(res_warm.info.iterations) < int(res_cold.info.iterations)
    rp, rd = kkt_residuals(Q, q, A, l, u, res_warm.x, res_warm.y)
    assert rp <= EPS and rd <= EPS


def test_no_scaling_path():
    Q, q, A, l, u = random_qp(20, 15, seed=9)
    res = _solve(Q, q, A, l, u, settings=qt.Settings(scaling=0))
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
    assert rp <= EPS and rd <= EPS


def test_non_proximal_path():
    Q, q, A, l, u = random_qp(20, 15, seed=10, rcond=1e-1)
    res = _solve(Q, q, A, l, u, settings=qt.Settings(proximal=False))
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
    assert rp <= EPS and rd <= EPS


def test_objective_value():
    Q, q, A, l, u = random_qp(20, 15, seed=11)
    res = _solve(Q, q, A, l, u)
    x = np.asarray(res.x)
    obj = 0.5 * x @ Q @ x + q @ x
    np.testing.assert_allclose(float(res.info.objective), obj, atol=1e-6)


def test_hybrid_warmup_matches_accuracy():
    """Two-phase float32->float64 solve reaches the same tolerance."""
    Q, q, A, l, u = random_qp(60, 40, seed=21)
    s = qt.Settings(hybrid_warmup=True, inner_max_iter=50,
                    kkt_dtype="float32", refine_steps=2)
    res = _solve(Q, q, A, l, u, settings=s)
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
    assert rp <= EPS and rd <= EPS


def test_hybrid_warmup_infeasible_detection_deferred():
    """Infeasibility latches still fire (in the accurate phase)."""
    Q = np.array([[1.0, 0.0], [0.0, 0.0]])
    q = np.array([1.0, 0.0])
    A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([-qt.QPDO_INFTY, 1.0, 1.0])
    u = np.array([0.0, 3.0, 3.0])
    res = _solve(Q, q, A, l, u,
                 settings=qt.Settings(hybrid_warmup=True, max_iter=200))
    assert int(res.info.status_val) == qt.PRIMAL_INFEASIBLE


def test_max_iter_status():
    Q, q, A, l, u = random_qp(40, 30, seed=12)
    res = _solve(Q, q, A, l, u, settings=qt.Settings(max_iter=3))
    assert int(res.info.status_val) == qt.MAX_ITER_REACHED
    assert int(res.info.iterations) == 3


def test_large_problem():
    """A single larger QP (n=600, m=400) through the dense path."""
    Q, q, A, l, u = random_qp(600, 400, seed=42, rcond=1e-2)
    res = _solve(Q, q, A, l, u)
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
    assert rp <= EPS and rd <= EPS


def test_warm_start_y_only():
    """qpdo_warm_start accepts NULL x with y given (qpdo.c:237-286)."""
    Q, q, A, l, u = random_qp(20, 15, seed=60)
    cold = _solve(Q, q, A, l, u)
    res = _solve(Q, q, A, l, u, y0=cold.y)
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
    assert rp <= EPS and rd <= EPS
    res2 = _solve(Q, q, A, l, u, x0=cold.x)   # and x-only
    assert int(res2.info.status_val) == qt.SOLVED


def test_bisect_linesearch_solves_identically():
    """linesearch='bisect' (sort-free) matches the sorted scan end-to-end."""
    Q, q, A, l, u = random_qp(40, 30, seed=80)
    r1 = _solve(Q, q, A, l, u)
    r2 = _solve(Q, q, A, l, u, settings=qt.Settings(linesearch="bisect"))
    assert int(r2.info.status_val) == qt.SOLVED
    # tau agrees to roundoff, not bitwise: iteration counts may differ by
    # an iteration or two, the solutions must agree to tolerance
    assert abs(int(r2.info.iterations) - int(r1.info.iterations)) <= 3
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x), atol=1e-6)


def test_anchored_phase2_mixed_gemms():
    """phase2_gemm_dtype="float32" (reduced-precision A-GEMMs with exact
    hard rows): solves still reach 1e-6 with residuals verified by the
    independent KKT oracle."""
    import qpdo_tpu as qt
    from utils import kkt_residuals, random_qp

    for seed in range(6):
        Q, q, A, l, u = random_qp(50, 75, seed=100 + seed)
        p = qt.make_problem(Q, q, A, l, u)
        s = qt.Settings(phase2_gemm_dtype="float32", hard_rows=16,
                        kkt_dtype="float32", refine_steps=2, mu_min=1e-7)
        res = qt.solve(p, s)
        assert int(res.info.status_val) == qt.SOLVED, seed
        rp, rd = kkt_residuals(Q, q, A, l, u, np.asarray(res.x),
                               np.asarray(res.y))
        assert rp < 1e-6 and rd < 1e-6, (seed, rp, rd)


def test_anchored_phase2_warm_resolve():
    """Mixed GEMMs stay accurate on the warm-start MPC path, where
    warm_mu_adapt shrinks the whole mu vector (the worst case for the
    hard-rows split: many small mu but tiny ||dx||)."""
    import qpdo_tpu as qt
    from utils import kkt_residuals, random_qp

    Q, q, A, l, u = random_qp(40, 60, seed=55)
    p = qt.make_problem(Q, q, A, l, u)
    s = qt.Settings(phase2_gemm_dtype="float32", kkt_dtype="float32",
                    refine_steps=2, mu_min=1e-7)
    cold = qt.solve(p, s)
    p2 = p._replace(q=p.q + 1e-3)
    warm = qt.solve(p2, s, x0=cold.x, y0=cold.y)
    assert int(warm.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, np.asarray(p2.q), A, l, u,
                           np.asarray(warm.x), np.asarray(warm.y))
    assert rp < 1e-6 and rd < 1e-6
    assert int(warm.info.iterations) < int(cold.info.iterations)


def test_accel_gamma_inertial_prox():
    """Safeguarded inertial prox-center extrapolation (Settings.accel_gamma):
    results still pass the independent KKT oracle at 1e-6, and on an
    outer-iteration-bound chained-constraint family (LISWET-style monotone
    smoothing) the iteration count does not regress."""
    import qpdo_tpu as qt
    from utils import kkt_residuals, random_qp

    # random dense QPs: accel must not break anything
    for seed in range(4):
        Q, q, A, l, u = random_qp(40, 60, seed=200 + seed)
        p = qt.make_problem(Q, q, A, l, u)
        res = qt.solve(p, qt.Settings(accel_gamma=0.5))
        assert int(res.info.status_val) == qt.SOLVED, seed
        rp, rd = kkt_residuals(Q, q, A, l, u, np.asarray(res.x),
                               np.asarray(res.y))
        assert rp < 1e-6 and rd < 1e-6, (seed, rp, rd)

    # chained one-sided constraints (second-difference cone): the
    # outer-bound regime accel targets
    n = 300
    rng = np.random.default_rng(3)
    Q = np.eye(n) * (1.0 + 1e-3)
    t = np.linspace(0, 1, n)
    q = -(np.sin(4 * np.pi * t) + 0.1 * rng.standard_normal(n))
    m = n - 2
    A = np.zeros((m, n))
    idx = np.arange(m)
    A[idx, idx] = 1.0
    A[idx, idx + 1] = -2.0
    A[idx, idx + 2] = 1.0
    l = np.zeros(m)
    u = np.full(m, np.inf)
    p = qt.make_problem(Q, q, A, l, u)
    base = qt.solve(p, qt.Settings(max_iter=20000))
    acc = qt.solve(p, qt.Settings(max_iter=20000, accel_gamma=0.5))
    assert int(base.info.status_val) == qt.SOLVED
    assert int(acc.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, np.asarray(acc.x),
                           np.asarray(acc.y))
    assert rp < 1e-6 and rd < 1e-6
    # the safeguard must keep accel within noise of the plain path on any
    # size (measured gains, ~7-10%, only appear at n >= ~2000 where the
    # outer crawl dominates — logs/accel_liswet*.log)
    assert int(acc.info.iterations) <= 1.25 * int(base.info.iterations)


def test_accel_gamma_validation():
    import pytest

    import qpdo_tpu as qt
    from qpdo_tpu.validate import validate_settings

    with pytest.raises(ValueError):
        validate_settings(qt.Settings(accel_gamma=1.0))
    with pytest.raises(ValueError):
        validate_settings(qt.Settings(accel_gamma=-0.1))


def test_polish_sharpens_and_skips_phase2():
    """Settings.polish: the saddle polish (a) leaves every problem
    oracle-verified at 1e-6 and (b) sharpens residuals far below eps
    (the loose iterate is replaced by the exact equality-KKT solution)."""
    import qpdo_tpu as qt
    from utils import kkt_residuals, random_qp

    for seed in range(6):
        Q, q, A, l, u = random_qp(60, 90, seed=300 + seed)
        p = qt.make_problem(Q, q, A, l, u)
        s = qt.Settings(hybrid_warmup=True, warmup_eps=1e-3,
                        kkt_dtype="float32", refine_steps=2, mu_min=1e-7,
                        polish=True)
        res = qt.solve(p, s)
        assert int(res.info.status_val) == qt.SOLVED, seed
        rp, rd = kkt_residuals(Q, q, A, l, u, np.asarray(res.x),
                               np.asarray(res.y))
        assert rp < 1e-6 and rd < 1e-6, (seed, rp, rd)

    # sharpening: with the identification correct, polished residuals sit
    # well below eps (a weakly-active row can keep rp ~1e-8; still >10x
    # sharper than the unpolished ~1e-6 iterate)
    Q, q, A, l, u = random_qp(60, 90, seed=300)
    p = qt.make_problem(Q, q, A, l, u)
    res = qt.solve(p, qt.Settings(polish=True))
    rp, rd = kkt_residuals(Q, q, A, l, u, np.asarray(res.x),
                           np.asarray(res.y))
    assert max(rp, rd) < 1e-7, (rp, rd)


def test_polish_never_unverified():
    """A rejected polish must leave the iterate untouched: with a tiny
    iteration budget the loose iterate's active set is wrong, and the
    result must either be honestly MAX_ITER_REACHED or genuinely solved —
    never a claimed-SOLVED that fails the oracle."""
    import qpdo_tpu as qt
    from utils import kkt_residuals, random_qp

    for seed in range(4):
        Q, q, A, l, u = random_qp(50, 75, seed=400 + seed)
        p = qt.make_problem(Q, q, A, l, u)
        res = qt.solve(p, qt.Settings(max_iter=8, polish=True))
        st = int(res.info.status_val)
        assert st in (qt.SOLVED, qt.MAX_ITER_REACHED)
        x = np.asarray(res.x)
        assert np.all(np.isfinite(x))
        if st == qt.SOLVED:
            rp, rd = kkt_residuals(Q, q, A, l, u, x, np.asarray(res.y))
            assert rp < 1e-6 and rd < 1e-6


def test_polish_keeps_infeasibility_certificates():
    """polish must not touch infeasibility-latched problems (their NaN
    contract and certificates are part of the MEX output parity)."""
    import qpdo_tpu as qt

    # the primal-infeasible fixture of infeasibility_tests.m (lines 33-48)
    Q = np.eye(2)
    q = np.zeros(2)
    A = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    l = np.array([0.0, 0.0, 3.0])
    u = np.array([1.0, 1.0, np.inf])
    p = qt.make_problem(Q, q, A, l, u)
    res = qt.solve(p, qt.Settings(polish=True))
    assert int(res.info.status_val) == qt.PRIMAL_INFEASIBLE
    dy = np.asarray(res.prim_inf_cert)
    assert np.all(np.isfinite(dy))
    # Farkas validation as in infeasibility_tests.m:50-55
    assert np.abs(A.T @ dy).max() <= 1e-6 * np.abs(dy).max() + 1e-12


def test_polish_warm_resolve_zero_iterations():
    """MPC re-solve with an unchanged active set: warm start + polish
    finishes in zero iterations (one verified saddle solve), still
    oracle-verified on the perturbed problem."""
    import qpdo_tpu as qt
    from utils import kkt_residuals, random_qp

    Q, q, A, l, u = random_qp(40, 60, seed=500)
    p = qt.make_problem(Q, q, A, l, u)
    s = qt.Settings(polish=True)
    cold = qt.solve(p, s)
    assert int(cold.info.status_val) == qt.SOLVED
    q2 = q + 1e-5
    p2 = p._replace(q=qt.make_problem(Q, q2, A, l, u).q)
    warm = qt.solve(p2, s, x0=cold.x, y0=cold.y)
    assert int(warm.info.status_val) == qt.SOLVED
    assert int(warm.info.iterations) == 0
    rp, rd = kkt_residuals(Q, q2, A, l, u, np.asarray(warm.x),
                           np.asarray(warm.y))
    assert rp < 1e-6 and rd < 1e-6


def test_polish_edge_cases():
    """Saddle polish on degenerate structures: duplicated active rows
    (more actives than variables — the -delta regularization path), all
    constraints inactive, pure LP (Q=0), and equality rows (l == u)."""
    import qpdo_tpu as qt

    rng = np.random.default_rng(0)
    s = qt.Settings(polish=True)

    n, m = 5, 12
    A = np.vstack([np.eye(5), np.eye(5), rng.standard_normal((2, 5))])
    Q = np.eye(n) * 0.5
    q = -np.ones(n)
    l = -0.1 * np.ones(m)
    u = 0.1 * np.ones(m)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), s)
    x, y = np.asarray(res.x), np.asarray(res.y)
    Ax = A @ x
    assert int(res.info.status_val) == qt.SOLVED
    assert np.abs(Ax - np.clip(Ax + y, l, u)).max() < 1e-6
    assert np.abs(Q @ x + q + A.T @ y).max() < 1e-6

    Q = np.zeros((8, 8))
    q = rng.standard_normal(8)
    A = np.vstack([np.eye(8), rng.standard_normal((8, 8))])
    l, u = -np.ones(16), np.ones(16)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), s)
    x, y = np.asarray(res.x), np.asarray(res.y)
    Ax = A @ x
    assert int(res.info.status_val) == qt.SOLVED
    assert np.abs(Ax - np.clip(Ax + y, l, u)).max() < 1e-6
    assert np.abs(q + A.T @ y).max() < 1e-6

    M = rng.standard_normal((10, 10))
    Q = M @ M.T / 10 + 0.1 * np.eye(10)
    q = rng.standard_normal(10)
    A = rng.standard_normal((6, 10))
    b = rng.standard_normal(6) * 0.1
    res = qt.solve(qt.make_problem(Q, q, A, b, b), s)
    x, y = np.asarray(res.x), np.asarray(res.y)
    assert int(res.info.status_val) == qt.SOLVED
    assert np.abs(A @ x - b).max() < 1e-6
    assert np.abs(Q @ x + q + A.T @ y).max() < 1e-6


def test_polish_warm_paths_agree():
    """The warm-start pre-loop polish must fire on all three delivery
    paths: the jitted solve_scaled, the host-driven (verbose/max_time)
    driver, and the compaction batch driver (code-review regression)."""
    import jax
    import jax.numpy as jnp

    import qpdo_tpu as qt
    from qpdo_tpu.parallel.batch import solve_batch
    from utils import random_qp

    Q, q, A, l, u = random_qp(30, 45, seed=600)
    p = qt.make_problem(Q, q, A, l, u)
    s = qt.Settings(polish=True)
    cold = qt.solve(p, s)
    p2 = p._replace(q=p.q + 1e-6)

    # host-driven path (finite max_time routes through solve_driven)
    s_driven = s.replace(max_time=1e6)
    warm_driven = qt.solve(p2, s_driven, x0=cold.x, y0=cold.y)
    assert int(warm_driven.info.status_val) == qt.SOLVED
    assert int(warm_driven.info.iterations) == 0

    # compaction batch path
    B = 4
    pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p2)
    x0 = jnp.broadcast_to(cold.x, (B,) + cold.x.shape)
    y0 = jnp.broadcast_to(cold.y, (B,) + cold.y.shape)
    warm_b = solve_batch(pb, s, x0=x0, y0=y0, compact=True)
    assert np.all(np.asarray(warm_b.info.status_val) == qt.SOLVED)
    assert np.all(np.asarray(warm_b.info.iterations) == 0)


def test_polish_info_consistency():
    """A polished result's Info must be self-consistent: inner residual
    norms re-stamped to the verified outer norms (code-review
    regression: a rescued straggler must not report SOLVED with stale
    large inner norms)."""
    import qpdo_tpu as qt
    from utils import random_qp

    Q, q, A, l, u = random_qp(30, 45, seed=601)
    p = qt.make_problem(Q, q, A, l, u)
    cold = qt.solve(p, qt.Settings(polish=True))
    warm = qt.solve(p, qt.Settings(polish=True), x0=cold.x, y0=cold.y)
    assert int(warm.info.iterations) == 0
    assert float(warm.info.res_prim_in_norm) <= 1e-6
    assert float(warm.info.res_dual_in_norm) <= 1e-6
    assert float(warm.info.res_prim_in_norm) == float(warm.info.res_prim_norm)


def test_saddle_solve_unit():
    """ops.linalg.saddle_solve vs a NumPy block solve, including the f32-LU
    + refinement mode."""
    import jax.numpy as jnp

    from qpdo_tpu.ops.linalg import saddle_solve

    rng = np.random.default_rng(9)
    n, m = 12, 18
    M = rng.standard_normal((n, n))
    Q = M @ M.T / n + 0.3 * np.eye(n)
    A = rng.standard_normal((m, n))
    act = (rng.random(m) < 0.5).astype(float)
    r1 = rng.standard_normal(n)
    r2 = rng.standard_normal(m)
    delta = 1e-8

    Aact = act[:, None] * A
    S = np.block([[Q, Aact.T],
                  [Aact, np.diag(-delta * act + (1 - act))]])
    ref = np.linalg.solve(S, np.concatenate([r1, r2]))

    for lu_dtype in (None, "float32"):
        v1, v2 = saddle_solve(jnp.asarray(Q), jnp.asarray(A),
                              jnp.asarray(act), jnp.asarray(r1),
                              jnp.asarray(r2), delta, refine_steps=3,
                              lu_dtype=lu_dtype)
        np.testing.assert_allclose(np.asarray(v1), ref[:n],
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(v2), ref[n:],
                                   rtol=1e-9, atol=1e-9)


def test_fused_newton_rhs_matches_baseline():
    """Settings.fused_newton_rhs folds the A'ytilde rhs matvec into the
    formation GEMM (one extra operand column) — an op-count cut for
    MXU-op-rate-bound parts (round-4).  Same error class as the separate
    matvec, so statuses must match and iterations stay in class across a
    seed sweep; every solve oracle-verifies."""
    for seed in range(6):
        Q, q, A, l, u = random_qp(40, 60, seed=100 + seed)
        p = qt.make_problem(Q, q, A, l, u)
        r0 = qt.solve(p)
        r1 = qt.solve(p, settings=qt.Settings(fused_newton_rhs=True))
        assert int(r1.info.status_val) == int(r0.info.status_val) == qt.SOLVED
        assert abs(int(r1.info.iterations) - int(r0.info.iterations)) <= 3
        rp, rd = kkt_residuals(Q, q, A, l, u, np.asarray(r1.x),
                               np.asarray(r1.y))
        assert max(rp, rd) < 1.1e-6


def test_qmv2_stacks_exactly():
    """Qmv2 (the round-4 stacked Q-matvec pair: Newton direction +
    dual-infeasibility certificate in ONE 2-column GEMM) must reproduce
    the separate Qmv calls on every operator that core.step() routes
    through it."""
    import jax.numpy as jnp
    from qpdo_tpu.solver.core import as_operator
    from qpdo_tpu.solver.scaling import scale_problem

    rng = np.random.default_rng(7)
    Q, q, A, l, u = random_qp(23, 31, seed=11)
    p = qt.make_problem(Q, q, A, l, u)
    op = as_operator(scale_problem(p, 10))
    xa = jnp.asarray(rng.standard_normal(23))
    xb = jnp.asarray(rng.standard_normal(23))
    ra, rb = op.Qmv2(xa, xb)
    # not bit-identical: XLA reduces the 2-column GEMM differently from
    # the standalone GEMV — but the same O(eps ||Q|| ||x||) error class
    np.testing.assert_allclose(np.asarray(ra), np.asarray(op.Qmv(xa)),
                               rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(np.asarray(rb), np.asarray(op.Qmv(xb)),
                               rtol=1e-13, atol=1e-15)
    # the dense 4-way stack [Q; A] @ [xa|xb] (one GEMM for all four
    # direction images)
    qa, qb, aa, ab = op.QAmv2(xa, xb)
    np.testing.assert_allclose(np.asarray(qa), np.asarray(op.Qmv(xa)),
                               rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(np.asarray(qb), np.asarray(op.Qmv(xb)),
                               rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(np.asarray(aa), np.asarray(op.Amv(xa)),
                               rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(np.asarray(ab), np.asarray(op.Amv(xb)),
                               rtol=1e-13, atol=1e-15)


def test_f32_kkt_at_reference_mu_min():
    """Round-4 capability: kkt_dtype="float32" now works at the
    REFERENCE's own mu_min=1e-9 default (constants.h:55) on the dense
    path — the auto PCG refinement (Settings.kkt_pcg_refine=-1) engages
    in the tiny-mu regime and restores state-accurate directions where
    the bare f32 factor floors at O(1e-2).  Previously this combo was a
    documented divergence class (CLAUDE.md rule: mu_min >= 1e-7)."""
    import scipy.sparse as sps

    n = 300
    rng = np.random.default_rng(0)
    d = np.sin(4 * np.pi * np.linspace(0, 1, n)) \
        + 0.1 * rng.standard_normal(n)
    Q = np.eye(n) * (1.0 + 1e-3)
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = np.asarray(sps.csr_matrix((vals, (rows, cols)),
                                  shape=(m, n)).todense())
    p = qt.make_problem(Q, -d, A, np.zeros(m), np.full(m, np.inf))
    # the aggressive mu schedule drives mu to the floor
    s = qt.Settings(eps_abs=1e-6, max_iter=20000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.2, delta=1e-4, theta=0.9,
                    kkt_dtype="float32", mu_min=1e-9)
    r = qt.solve(p, settings=s)
    assert int(r.info.status_val) == qt.SOLVED
    x, y = np.asarray(r.x), np.asarray(r.y)
    Ax = A @ x
    rp = np.max(np.abs(Ax - np.clip(Ax + y, 0.0, np.inf)))
    rd = np.max(np.abs(Q @ x - d + A.T @ y))
    assert max(rp, rd) < 2e-6, (rp, rd)


def test_chol_fori_parity():
    """The fori-loop Cholesky/substitutions (ops/linalg._chol_fori et
    al. — the TPU-safe dense state-dtype escalation) match the native
    implementations to machine precision, including batched."""
    import jax
    import jax.numpy as jnp
    from qpdo_tpu.ops.linalg import _chol_fori, _tri_solve_fori

    rng = np.random.default_rng(1)
    for shape in ((30, 30), (4, 17, 17)):
        M = rng.standard_normal(shape)
        K = jnp.asarray(M @ np.swapaxes(M, -1, -2)
                        + shape[-1] * np.eye(shape[-1]))
        L, Lref = _chol_fori(K), jnp.linalg.cholesky(K)
        np.testing.assert_allclose(L, Lref, atol=1e-11)
        r = jnp.asarray(rng.standard_normal(shape[:-1]))
        for trans in (False, True):
            x = _tri_solve_fori(L, r, trans=trans)
            xr = jax.scipy.linalg.solve_triangular(
                Lref, r[..., None], lower=True, trans=int(trans))[..., 0]
            np.testing.assert_allclose(x, xr, atol=1e-11)


def test_dense_escalation_beyond_f32_breakdown():
    """Round-4 regression, dense analogue of the banded staircase class:
    at n=400 the dense LISWET at mu_min=1e-9 with kkt_dtype='float32'
    exploded to rd ~ 2.4e+20 pre-fix (the f32 factor NaNs beyond
    cond ~ 1/eps32, the PCG preconditioner is NaN from iteration 1, the
    zero-guard direction staircases the duals at rp/mu —
    logs/dense_mu1e9_probe.log).  With the state-dtype escalation
    (Settings.kkt_escalate_rtol) it must SOLVE — and faster than at
    mu_min=1e-7, whose crippled ALM outer rate is exactly why the
    reference defaults to 1e-9 (constants.h:55)."""
    import scipy.sparse as sps

    n = 400
    rng = np.random.default_rng(42)
    d = np.sin(4 * np.pi * np.linspace(0, 1, n)) \
        + 0.1 * rng.standard_normal(n)
    Q = np.eye(n) * (1.0 + 1e-3)
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = np.asarray(sps.csr_matrix((vals, (rows, cols)),
                                  shape=(m, n)).todense())
    p = qt.make_problem(Q, -d, A, np.zeros(m), np.full(m, np.inf))
    s = qt.Settings(eps_abs=1e-6, max_iter=4000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.2, delta=1e-4, theta=0.9,
                    kkt_dtype="float32", mu_min=1e-9, refine_steps=3,
                    hybrid_warmup=False)
    r = qt.solve(p, settings=s)
    assert int(r.info.status_val) == qt.SOLVED
    x, y = np.asarray(r.x), np.asarray(r.y)
    assert np.max(np.abs(y)) < 1e5, "dual explosion (the staircase class)"
    Ax = A @ x
    rp = np.max(np.abs(Ax - np.clip(Ax + y, 0.0, np.inf)))
    rd = np.max(np.abs(Q @ x - d + A.T @ y))
    assert max(rp, rd) < 2e-6, (rp, rd)


def test_kkt_solver_modes_match_direct():
    """Round-5 factorization-free dense Newton modes: "cg" (while-PCG,
    Eisenstat-Walker forcing), "inv" (anchored explicit inverse as CG
    preconditioner), and "ns" (Newton-Schulz-tracked inverse, fixed
    big-op count) must solve the same problems to the same oracle as the
    direct path — directions are inexact, convergence is not."""
    from utils import kkt_residuals, random_qp

    Q, q, A, l, u = random_qp(40, 60, seed=21)
    p = qt.make_problem(Q, q, A, l, u)
    res_ref = qt.solve(p)
    assert int(res_ref.info.status_val) == qt.SOLVED
    for mode, extra in (("cg", {}), ("cg", {"kkt_cg_fixed": 12}),
                        ("inv", {}),
                        ("inv", {"kkt_cg_fixed": 6}),
                        ("ns", {"kkt_ns_steps": 3}),
                        ("ns", {"kkt_ns_steps": 5,
                                "kkt_inv_refresh": False}),
                        ("ns", {"kkt_ns_steps": 2, "anchor_every": 5})):
        res = qt.solve(p, qt.Settings(kkt_solver=mode, **extra))
        assert int(res.info.status_val) == qt.SOLVED, mode
        rp, rd = kkt_residuals(Q, q, A, l, u, np.asarray(res.x),
                               np.asarray(res.y))
        assert rp < 1e-6 and rd < 1e-6, (mode, rp, rd)
        np.testing.assert_allclose(np.asarray(res.x),
                                   np.asarray(res_ref.x), atol=1e-5)


def test_kkt_solver_ns_f32_kkt_dtype():
    """ns mode under the mixed-precision contract (f64 state, f32 K/X):
    the state-dtype correction sweep must still deliver eps_abs."""
    from utils import kkt_residuals, random_qp

    Q, q, A, l, u = random_qp(50, 75, seed=22)
    p = qt.make_problem(Q, q, A, l, u)
    res = qt.solve(p, qt.Settings(kkt_solver="ns", kkt_dtype="float32",
                                  mu_min=1e-7, refine_steps=2))
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, np.asarray(res.x),
                           np.asarray(res.y))
    assert rp < 1e-6 and rd < 1e-6
