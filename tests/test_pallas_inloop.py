"""In-loop integration of the Pallas kernels (Settings.pallas_formation /
pallas_residuals) — SURVEY §7 step 4's "swap under the same signatures"
clause, wired behind flags in round 4.

On CPU the kernels run in interpret mode (pure jnp semantics), so these
tests pin exact algorithmic equivalence: same statuses, same iteration
counts, solutions equal to refinement-level noise.  The TPU wins/losses
are measured separately (scripts/tpu_queue*, BENCH A/B rows).
"""
import numpy as np
import pytest

import qpdo_tpu as qt
from qpdo_tpu.parallel import solve_batch

from utils import kkt_residuals, random_qp


def _problem(seed=0, n=40, m=60):
    Q, q, A, l, u = random_qp(n, m, seed=seed)
    return qt.make_problem(Q, q, A, l, u)


@pytest.mark.parametrize("flags", [
    dict(pallas_formation=True),
    dict(pallas_residuals=True),
    dict(pallas_formation=True, pallas_residuals=True),
])
def test_inloop_pallas_matches_baseline_single(flags):
    prob = _problem()
    r0 = qt.solve(prob)
    r1 = qt.solve(prob, settings=qt.Settings(**flags))
    assert int(r1.info.status_val) == int(r0.info.status_val) == qt.SOLVED
    assert int(r1.info.iterations) == int(r0.info.iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x),
                               atol=1e-9)


def test_inloop_pallas_batched_oracle():
    """vmap over the Pallas path (the bench execution shape): statuses
    and iterations identical to the jnp path, oracle-verified."""
    rng = np.random.default_rng(3)
    B, n, m = 4, 30, 45
    M = rng.standard_normal((B, n, n))
    Q = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    prob = qt.Problem(Q=Q, q=rng.standard_normal((B, n)),
                      A=rng.standard_normal((B, m, n)),
                      l=-np.ones((B, m)), u=np.ones((B, m)),
                      c=np.zeros(B))
    s = qt.Settings(pallas_formation=True, pallas_residuals=True)
    r0 = solve_batch(prob)
    r1 = solve_batch(prob, settings=s)
    np.testing.assert_array_equal(np.asarray(r1.info.status_val),
                                  np.asarray(r0.info.status_val))
    np.testing.assert_array_equal(np.asarray(r1.info.iterations),
                                  np.asarray(r0.info.iterations))
    for b in range(B):
        rp, rd = kkt_residuals(Q[b], prob.q[b], prob.A[b], prob.l[b],
                               prob.u[b], np.asarray(r1.x)[b],
                               np.asarray(r1.y)[b])
        assert max(rp, rd) < 1.1e-6


def test_inloop_pallas_bench_config():
    """The bench configuration (hybrid float32 warmup + polish + mixed
    GEMMs) with both kernels on: the f32 warmup phase is where the
    kernels engage on TPU, so the composition must hold end-to-end."""
    rng = np.random.default_rng(7)
    B, n, m = 3, 40, 60
    M = rng.standard_normal((B, n, n))
    Q = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    prob = qt.Problem(Q=Q, q=rng.standard_normal((B, n)),
                      A=rng.standard_normal((B, m, n)),
                      l=-rng.random((B, m)), u=rng.random((B, m)),
                      c=np.zeros(B))
    s = qt.Settings(eps_abs=1e-6, max_iter=300, inner_max_iter=50,
                    eps_abs_in=0.1, rho=0.02, delta=0.1,
                    refine_steps=2, kkt_dtype="float32",
                    hybrid_warmup=True, mu_min=1e-7,
                    cert_dtype="float32", linesearch="bisect",
                    linesearch_dtype="float32",
                    phase2_gemm_dtype="float32", hard_rows=8,
                    polish=True, warmup_eps=1e-3,
                    pallas_formation=True, pallas_residuals=True)
    res = solve_batch(prob, settings=s)
    assert np.all(np.asarray(res.info.status_val) == qt.SOLVED)
    for b in range(B):
        rp, rd = kkt_residuals(Q[b], prob.q[b], prob.A[b], prob.l[b],
                               prob.u[b], np.asarray(res.x)[b],
                               np.asarray(res.y)[b])
        assert max(rp, rd) < 1.1e-6
