"""Host-driven solve paths: verbose printing and max_time enforcement."""

import numpy as np

import qpdo_tpu as qt

from utils import random_qp


def test_verbose_prints_table(capsys):
    Q, q, A, l, u = random_qp(20, 15, seed=1)
    res = qt.solve(qt.make_problem(Q, q, A, l, u),
                   qt.Settings(verbose=True, print_interval=1))
    out = capsys.readouterr().out
    assert int(res.info.status_val) == qt.SOLVED
    assert "QPDO" in out
    assert "r.prim" in out
    assert "QPDO finished successfully." in out
    # one table row per iteration
    rows = [ln for ln in out.splitlines() if ln.strip().startswith(tuple("0123456789"))]
    assert len(rows) >= int(res.info.iterations) - 1


def test_verbose_matches_silent():
    Q, q, A, l, u = random_qp(25, 18, seed=2)
    p = qt.make_problem(Q, q, A, l, u)
    res_v = qt.solve(p, qt.Settings(verbose=True))
    res_s = qt.solve(p, qt.Settings(verbose=False))
    assert int(res_v.info.status_val) == int(res_s.info.status_val)
    assert int(res_v.info.iterations) == int(res_s.info.iterations)
    np.testing.assert_allclose(np.asarray(res_v.x), np.asarray(res_s.x),
                               atol=1e-12)


def test_max_time_reached():
    Q, q, A, l, u = random_qp(60, 40, seed=3)
    # an impossible tolerance with a tiny time budget must time out
    res = qt.solve(qt.make_problem(Q, q, A, l, u),
                   qt.Settings(eps_abs=1e-14, max_time=1e-4, max_iter=10**6))
    assert int(res.info.status_val) == qt.MAX_TIME_REACHED


def test_max_time_not_reached():
    Q, q, A, l, u = random_qp(20, 15, seed=4)
    res = qt.solve(qt.make_problem(Q, q, A, l, u),
                   qt.Settings(max_time=120.0))
    assert int(res.info.status_val) == qt.SOLVED


def test_verbose_mixed_mode_anchored(capsys):
    """The verbose single-step driver re-anchors the caches in mixed-GEMM
    mode (run_loop's nested anchor is bypassed there)."""
    import qpdo_tpu as qt
    from utils import kkt_residuals, random_qp

    Q, q, A, l, u = random_qp(30, 45, seed=77)
    p = qt.make_problem(Q, q, A, l, u)
    s = qt.Settings(verbose=True, phase2_gemm_dtype="float32",
                    kkt_dtype="float32", refine_steps=2, mu_min=1e-7,
                    max_iter=300)
    res = qt.solve(p, s)
    capsys.readouterr()
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, np.asarray(res.x),
                           np.asarray(res.y))
    assert rp < 1e-6 and rd < 1e-6


def test_max_time_interrupts_hybrid_warmup():
    """max_time bounds phase 1 too: the float32 warmup is chunk-driven in
    solve_driven (round 3 — previously one jitted _warmup_pass of up to
    max_iter/2 iterations that the clock could not interrupt)."""
    Q, q, A, l, u = random_qp(100, 150, seed=4)
    s = qt.Settings(hybrid_warmup=True, mu_min=1e-7, max_iter=20000,
                    max_time=1e-6)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), s)
    assert int(res.info.status_val) == qt.MAX_TIME_REACHED
    # stopped within the first warmup chunk (+ a few upcast bookkeeping
    # iterations), nowhere near the 10000-iteration warmup cap
    assert int(res.info.iterations) <= 64
