"""Host-driven solve paths: verbose printing and max_time enforcement."""

import numpy as np

import qpdo_tpu as qt

from utils import kkt_residuals, random_qp


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


def test_crash_recovery_resumes_from_snapshot(monkeypatch):
    """Crash-resilient segmentation (Settings.crash_recovery): a device
    execution that dies mid-solve is retried from the host-side chunk
    snapshot after backend recovery — the solve completes and verifies
    instead of propagating the crash (the RESULTS.md platform fault
    class, simulated here by failing the first chunk execution)."""
    from qpdo_tpu.solver import driver

    real_run_chunk = driver._run_chunk
    calls = {"n": 0, "recovered": 0}

    def flaky_run_chunk(op, settings, state, cap):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated device/worker crash")
        return real_run_chunk(op, settings, state, cap)

    monkeypatch.setattr(driver, "_run_chunk", flaky_run_chunk)
    monkeypatch.setattr(driver, "_recover_backend",
                        lambda *a, **k: calls.__setitem__(
                            "recovered", calls["recovered"] + 1) or True)

    Q, q, A, l, u = random_qp(40, 60, seed=9)
    # max_time routes through solve_driven (the host-chunked path)
    s = qt.Settings(max_time=600.0, crash_recovery=2)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), s)
    assert calls["recovered"] == 1
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, np.asarray(res.x),
                           np.asarray(res.y))
    assert rp < 1e-6 and rd < 1e-6


def test_crash_recovery_survives_failed_restore(monkeypatch):
    """The RESTORE path is itself protected (round-5 fix of the round-4
    ladder-killer, driver.py:207): when re-materializing the snapshot
    raises because the worker is still recovering, the driver backs off,
    re-probes, and retries the restore — WITHOUT spending a recovery
    credit — then completes the solve."""
    from qpdo_tpu.solver import driver

    real_run_chunk = driver._run_chunk
    real_device_tree = driver._device_tree
    calls = {"chunk": 0, "restore": 0, "probes": 0}

    def flaky_run_chunk(op, settings, state, cap):
        calls["chunk"] += 1
        if calls["chunk"] == 1:
            raise RuntimeError("simulated device/worker crash")
        return real_run_chunk(op, settings, state, cap)

    def flaky_device_tree(t):
        calls["restore"] += 1
        # fail the first TWO restore attempts (each attempt makes up to
        # two _device_tree calls; fail on the first of each)
        if calls["restore"] <= 2:
            raise RuntimeError("TPU worker process crashed or restarted")
        return real_device_tree(t)

    monkeypatch.setattr(driver, "_run_chunk", flaky_run_chunk)
    monkeypatch.setattr(driver, "_device_tree", flaky_device_tree)
    monkeypatch.setattr(
        driver, "_recover_backend",
        lambda *a, **k: calls.__setitem__("probes", calls["probes"] + 1)
        or True)
    monkeypatch.setattr(driver.time, "sleep", lambda s: None)

    Q, q, A, l, u = random_qp(40, 60, seed=9)
    # crash_recovery=1: ONE credit; it must cover the failed attempt while
    # the two failed restores cost nothing
    s = qt.Settings(max_time=600.0, crash_recovery=1)
    res = qt.solve(qt.make_problem(Q, q, A, l, u), s)
    assert calls["restore"] >= 3  # two failed + successful restore pair
    assert calls["probes"] == 3   # re-probed after each failure
    assert int(res.info.status_val) == qt.SOLVED
    rp, rd = kkt_residuals(Q, q, A, l, u, np.asarray(res.x),
                           np.asarray(res.y))
    assert rp < 1e-6 and rd < 1e-6


def test_crash_recovery_restore_failures_bounded(monkeypatch):
    """A restore that NEVER succeeds gives up after _RESTORE_MAX_FAILURES
    backoff rounds instead of looping forever."""
    import pytest as _pytest

    from qpdo_tpu.solver import driver

    def boom_chunk(op, settings, state, cap):
        raise RuntimeError("simulated device/worker crash")

    def boom_restore(t):
        raise RuntimeError("TPU worker process crashed or restarted")

    monkeypatch.setattr(driver, "_run_chunk", boom_chunk)
    monkeypatch.setattr(driver, "_device_tree", boom_restore)
    monkeypatch.setattr(driver, "_recover_backend", lambda *a, **k: True)
    sleeps = []
    monkeypatch.setattr(driver.time, "sleep", sleeps.append)

    Q, q, A, l, u = random_qp(30, 45, seed=11)
    s = qt.Settings(max_time=600.0, crash_recovery=5)
    with _pytest.raises(RuntimeError):
        qt.solve(qt.make_problem(Q, q, A, l, u), s)
    assert len(sleeps) == driver._RESTORE_MAX_FAILURES


def test_crash_recovery_disabled_propagates(monkeypatch):
    """crash_recovery=0 keeps the old contract: the exception escapes."""
    import pytest as _pytest

    from qpdo_tpu.solver import driver

    def boom(op, settings, state, cap):
        raise RuntimeError("simulated device/worker crash")

    monkeypatch.setattr(driver, "_run_chunk", boom)
    Q, q, A, l, u = random_qp(30, 45, seed=10)
    s = qt.Settings(max_time=600.0, crash_recovery=0)
    with _pytest.raises(RuntimeError, match="simulated"):
        qt.solve(qt.make_problem(Q, q, A, l, u), s)
