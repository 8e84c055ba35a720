"""Warmup stall guard (Settings.warmup_stall_exit, round-3):

On chained-constraint families (LISWET-class) the hybrid float32 phase's
mu floor (warmup_mu_min) stalls the penalty schedule — measured 22x
iteration blowup (RESULTS.md dense-family sweep, 244 -> 5392).  The guard
detects the primal-residual plateau at phase-1 outer updates and exits to
the accurate phase immediately.  These tests pin:
- the LISWET regression: hybrid-on within 2x of hybrid-off iterations;
- neutrality on well-behaved problems;
- the internal WARMUP_STALLED status never escapes to the user.
"""

import numpy as np

import qpdo_tpu as qt

from utils import kkt_residuals, random_qp


def _liswet(n, seed=0):
    """min 0.5||x - d||^2 s.t. x_i - 2 x_{i+1} + x_{i+2} >= 0 (dense)."""
    rng = np.random.default_rng(seed)
    Q = np.eye(n) * (1.0 + 1e-3)
    t = np.linspace(0, 1, n)
    q = -(np.sin(4 * np.pi * t) + 0.1 * rng.standard_normal(n))
    m = n - 2
    A = np.zeros((m, n))
    idx = np.arange(m)
    A[idx, idx] = 1.0
    A[idx, idx + 1] = -2.0
    A[idx, idx + 2] = 1.0
    return Q, q, A, np.zeros(m), np.full(m, np.inf)


def test_liswet_hybrid_within_2x_of_off():
    Q, q, A, l, u = _liswet(500)
    prob = qt.make_problem(Q, q, A, l, u)
    off = qt.solve(prob, qt.Settings(max_iter=20000))
    on = qt.solve(prob, qt.Settings(max_iter=20000, hybrid_warmup=True,
                                    mu_min=1e-7))
    assert int(off.info.status_val) == qt.SOLVED
    assert int(on.info.status_val) == qt.SOLVED
    # guard active: without it this is ~18x (6644 vs 364 measured)
    assert int(on.info.iterations) <= 2 * int(off.info.iterations)
    rp, rd = kkt_residuals(Q, q, A, l, u, on.x, on.y)
    assert max(rp, rd) <= 1e-6
    # the stall was detected early in phase 1, not at the warmup cap
    assert int(on.info.warmup_iterations) < 100


def test_guard_neutral_on_wellbehaved():
    Q, q, A, l, u = random_qp(80, 120, seed=5)
    prob = qt.make_problem(Q, q, A, l, u)
    base = dict(hybrid_warmup=True, mu_min=1e-7)
    on = qt.solve(prob, qt.Settings(**base))
    off = qt.solve(prob, qt.Settings(**base, warmup_stall_exit=0.0))
    assert int(on.info.status_val) == qt.SOLVED
    assert int(off.info.status_val) == qt.SOLVED
    # the guard may re-route a few iterations but must stay close
    assert int(on.info.iterations) <= int(off.info.iterations) + 20
    rp, rd = kkt_residuals(Q, q, A, l, u, on.x, on.y)
    assert max(rp, rd) <= 1e-6


def test_internal_status_never_escapes():
    """Even when the guard fires, the returned status is a reference code."""
    Q, q, A, l, u = _liswet(200)
    res = qt.solve(qt.make_problem(Q, q, A, l, u),
                   qt.Settings(max_iter=20000, hybrid_warmup=True,
                               mu_min=1e-7))
    assert int(res.info.status_val) in (
        qt.SOLVED, qt.MAX_ITER_REACHED, qt.PRIMAL_INFEASIBLE,
        qt.DUAL_INFEASIBLE, qt.NON_CVX)
