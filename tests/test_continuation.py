"""Continuation ladder (qpdo_tpu.continuation).

The LISWET family is the motivating case: multipliers of the
second-difference constraints scale ~n^2, so cold solves crawl ~n
iterations while a prolonged warm start hands the fine level a
near-converged active set (RESULTS.md "LISWET continuation").
"""
import os
import numpy as np
import pytest
import scipy.sparse as sps

import qpdo_tpu as qt


def liswet(n, rng):
    Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
    t = np.linspace(0, 1, n)
    d = np.sin(4 * np.pi * t) + 0.1 * rng.standard_normal(n)
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
    return Q, -d, A, np.zeros(m), np.full(m, np.inf)


def restrict_liswet(fine, n_coarse):
    """The coarse problem of the same continuous instance: d restricted."""
    Qf, qf, Af, lf, uf = fine
    nf = qf.shape[0]
    d = np.interp(np.linspace(0, 1, n_coarse), np.linspace(0, 1, nf), -qf)
    n = n_coarse
    Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
    return Q, -d, A, np.zeros(m), np.full(m, np.inf)


SETTINGS = qt.Settings(eps_abs=1e-6, max_iter=20000, inner_max_iter=100,
                       eps_abs_in=0.1, rho=0.2, delta=1e-4, theta=0.9)


def kkt_ok(p, res, eps=1e-6):
    Q, q, A, l, u = p
    x, y = np.asarray(res.x), np.asarray(res.y)
    Ax = A @ x
    rp = np.max(np.abs(Ax - np.clip(Ax + y, l, u)))
    rd = np.max(np.abs(Q @ x + q + A.T @ y))
    return rp <= eps and rd <= eps


def test_grid1d_ladder_solves_and_saves_iterations():
    rng = np.random.default_rng(3)
    fine = liswet(480, rng)
    coarse = restrict_liswet(fine, 120)
    mid = restrict_liswet(fine, 240)

    def prolong(x, y, level):
        n_from = (120, 240)[level]
        n_to = (240, 480)[level]
        return qt.grid1d_prolong(n_from, n_to, order=2)(x, y)

    ladder = qt.solve_continuation([coarse, mid, fine], SETTINGS,
                                   prolong=prolong, dtype="float64",
                                   return_all=True)
    assert all(int(np.asarray(r.info.status_val)) == qt.SOLVED
               for r in ladder)
    assert kkt_ok(fine, ladder[-1])
    # the warm-started fine level beats the cold fine solve decisively
    cold = qt.solve_sparse(*fine, settings=SETTINGS, dtype="float64")
    assert int(ladder[-1].info.iterations) < 0.6 * int(cold.info.iterations)
    # ladder Result carries the whole-ladder wall time
    assert float(ladder[-1].info.run_time) > 0.0


def test_identity_continuation_dense_homotopy():
    """prolong=None: a data ramp over same-shape dense problems (the
    parametric/homotopy case) — each level warm-starts from the last."""
    rng = np.random.default_rng(5)
    n, m = 40, 30
    M = rng.standard_normal((n, n))
    Q = M @ M.T / n + 0.1 * np.eye(n)
    A = rng.standard_normal((m, n))
    l, u = -np.ones(m), np.ones(m)
    q1 = rng.standard_normal(n)
    q0 = np.zeros(n)
    probs = [qt.make_problem(Q, (1 - a) * q0 + a * q1, A, l, u)
             for a in (0.25, 0.5, 1.0)]
    res = qt.solve_continuation(probs, qt.Settings())
    assert int(np.asarray(res.info.status_val)) == qt.SOLVED
    assert kkt_ok((Q, q1, A, l, u), res)


def test_empty_ladder_raises():
    with pytest.raises(ValueError):
        qt.solve_continuation([], qt.Settings())


def cont2d(k, alpha=1e-2, ubox=0.05):
    """Deterministic CONT-style instance of one continuous problem at
    resolution k: min 0.5||y-yd||^2 + alpha/2||u||^2 s.t. the unscaled
    5-point Poisson rows L y - h^2 u = h^2 f and a box on u (y free, so
    every resolution is trivially feasible)."""
    n_grid = k * k
    h2 = 1.0 / (k + 1) ** 2
    t = (np.arange(k) + 1.0) / (k + 1.0)
    X, Y = np.meshgrid(t, t, indexing="ij")
    yd = (np.sin(np.pi * X) * np.sin(np.pi * Y)).ravel()
    f = 5.0 * (np.sin(2 * np.pi * X) * np.cos(np.pi * Y)).ravel()

    p = np.arange(n_grid)
    i, j = p // k, p % k
    rows, cols, vals = [p], [p], [np.full(n_grid, 4.0)]
    for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        ii, jj = i + di, j + dj
        keep = (ii >= 0) & (ii < k) & (jj >= 0) & (jj < k)
        rows.append(p[keep]); cols.append(ii[keep] * k + jj[keep])
        vals.append(np.full(keep.sum(), -1.0))
    L = sps.csr_matrix((np.concatenate(vals),
                        (np.concatenate(rows), np.concatenate(cols))),
                       shape=(n_grid, n_grid))

    n = 2 * n_grid
    Q = sps.diags(np.where(np.arange(n) % 2 == 0, 1.0, alpha)).tocsr()
    q = np.zeros(n); q[0::2] = -yd
    Lc = L.tocoo()
    A_eq = sps.csr_matrix(
        (np.concatenate([Lc.data, np.full(n_grid, -h2)]),
         (np.concatenate([Lc.row, p]),
          np.concatenate([2 * Lc.col, 2 * p + 1]))), shape=(n_grid, n))
    I_u = sps.csr_matrix((np.ones(n_grid), (p, 2 * p + 1)),
                         shape=(n_grid, n))
    A = sps.vstack([A_eq, I_u]).tocsr()
    l = np.concatenate([h2 * f, np.full(n_grid, -ubox)])
    u = np.concatenate([h2 * f, np.full(n_grid, ubox)])
    return Q, q, A, l, u


def test_grid2d_interp_exact_on_bilinear():
    """Injection at coincident nodes (kf+1 = 2(kc+1)) and bilinear
    exactness inside the coarse hull; the Dirichlet pad reproduces a
    boundary-vanishing bilinear field everywhere."""
    kc = 6
    kf = 2 * kc + 1
    tc = (np.arange(kc) + 1.0) / (kc + 1.0)
    tf = (np.arange(kf) + 1.0) / (kf + 1.0)
    Xc, Yc = np.meshgrid(tc, tc, indexing="ij")
    Xf, Yf = np.meshgrid(tf, tf, indexing="ij")

    g = lambda X, Y: 2.0 + 3.0 * X - Y + 0.5 * X * Y
    out = qt.grid2d_interp(kc, kf, g(Xc, Yc).ravel()).reshape(kf, kf)
    # fine node 2c+1 coincides with coarse node c: injection is exact
    np.testing.assert_allclose(out[1::2, 1::2], g(Xc, Yc), atol=1e-12)
    # interior hull (between coarse nodes): bilinear fields reproduce
    np.testing.assert_allclose(out[1:-1, 1:-1], g(Xf, Yf)[1:-1, 1:-1],
                               atol=1e-12)

    # Dirichlet pad: exact everywhere for a field linear between the
    # padded nodes and zero on the boundary
    tcp = np.concatenate([[0.0], tc, [1.0]])
    hat = lambda t: np.interp(t, tcp, np.r_[0.0, np.ones(kc), 0.0])
    gd = lambda X, Y: hat(X) * hat(Y)  # vanishes on the whole boundary
    outd = qt.grid2d_interp(kc, kf, gd(Xc, Yc).ravel(), boundary=0.0)
    np.testing.assert_allclose(outd, gd(Xf, Yf).ravel(), atol=1e-12)


def test_grid2d_cont_ladder_saves_iterations():
    """A 2-level CONT ladder (coarse solve + prolonged warm start) reaches
    the same verified solution in fewer fine-level iterations than cold."""
    kc, kf = 8, 16
    coarse = cont2d(kc)
    fine = cont2d(kf)
    s = qt.Settings(eps_abs=1e-6, max_iter=20000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.02, delta=0.1)

    cold = qt.solve_sparse(*fine, settings=s)
    assert int(cold.info.status_val) == qt.SOLVED

    def prolong(x, y):
        ncg, nfg = kc * kc, kf * kf
        x0 = np.empty(2 * nfg)
        x0[0::2] = qt.grid2d_interp(kc, kf, x[0::2], boundary=0.0)
        x0[1::2] = qt.grid2d_interp(kc, kf, x[1::2])
        scale = ((kf + 1.0) / (kc + 1.0)) ** 2  # smooth lam ~ h^-2
        y0 = np.concatenate([
            qt.grid2d_interp(kc, kf, y[:ncg]) * scale,
            qt.grid2d_interp(kc, kf, y[ncg:]),
        ])
        return x0, y0

    results = qt.solve_continuation([coarse, fine], settings=s,
                                    prolong=prolong, return_all=True)
    res = results[-1]
    assert int(res.info.status_val) == qt.SOLVED
    Q, q, A, l, u = fine
    x, y = np.asarray(res.x), np.asarray(res.y)
    rp = np.max(np.abs(A @ x - np.clip(A @ x + y, l, u)))
    rd = np.max(np.abs(Q @ x + q + A.T @ y))
    assert rp <= 1e-5 and rd <= 1e-5
    fine_iters = int(results[-1].info.iterations)
    assert fine_iters < int(cold.info.iterations)


def test_refine_final_noop_when_oracle_passes():
    """refine_final leaves an already-verified ladder untouched (the
    firing path — a warm fine level with a stale prox center — is
    exercised at scale by examples/continuation.py, RESULTS.md LISWET
    n=90k)."""
    kc, kf = 8, 16
    s = qt.Settings(eps_abs=1e-6, max_iter=20000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.02, delta=0.1)

    def prolong(x, y):
        ncg, nfg = kc * kc, kf * kf
        x0 = np.empty(2 * nfg)
        x0[0::2] = qt.grid2d_interp(kc, kf, x[0::2], boundary=0.0)
        x0[1::2] = qt.grid2d_interp(kc, kf, x[1::2])
        scale = ((kf + 1.0) / (kc + 1.0)) ** 2
        y0 = np.concatenate([
            qt.grid2d_interp(kc, kf, y[:ncg]) * scale,
            qt.grid2d_interp(kc, kf, y[ncg:]),
        ])
        return x0, y0

    plain = qt.solve_continuation([cont2d(kc), cont2d(kf)], settings=s,
                                  prolong=prolong)
    refined = qt.solve_continuation([cont2d(kc), cont2d(kf)], settings=s,
                                    prolong=prolong, refine_final=True)
    np.testing.assert_allclose(np.asarray(refined.x), np.asarray(plain.x),
                               atol=0)
    assert int(refined.info.iterations) == int(plain.info.iterations)


def test_continuation_process_level_resume(tmp_path):
    """resume_path: a ladder killed between levels resumes in a FRESH
    process from the last completed level (the recovery tier above
    crash_recovery, for the platform fault class where the in-process
    client cannot reattach — round-5 n=90k ladder post-mortem)."""
    import scipy.sparse as sps

    def liswet(n):
        rng = np.random.default_rng(1)
        t = np.linspace(0, 1, n)
        d = np.sin(4 * np.pi * t) + 0.1 * rng.standard_normal(n)
        Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
        m = n - 2
        rows = np.repeat(np.arange(m), 3)
        cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
        vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
        A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
        return Q, -d, A, np.zeros(m), np.full(m, np.inf)

    levels = [50, 100, 200]
    problems = [liswet(n) for n in levels]

    def prolong(x, y, i):
        return qt.grid1d_prolong(levels[i], levels[i + 1], order=2)(x, y)

    s = qt.Settings(eps_abs=1e-6, max_iter=20000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.2, delta=1e-4, theta=0.9)
    path = str(tmp_path / "ladder.npz")

    # run levels 0-1, then "die" (simulated by a raising progress hook)
    class Boom(Exception):
        pass

    def die_after_1(i, r):
        if i == 1:
            raise Boom

    try:
        qt.solve_continuation(problems, s, prolong=prolong,
                              return_all=True, progress=die_after_1,
                              resume_path=path)
        raise AssertionError("hook should have fired")
    except Boom:
        pass
    assert os.path.exists(path)
    import numpy as _np
    assert int(_np.load(path)["level"]) == 1

    # a "fresh process": resume skips levels 0-1
    seen = []
    out = qt.solve_continuation(problems, s, prolong=prolong,
                                return_all=True,
                                progress=lambda i, r: seen.append(i),
                                resume_path=path)
    assert seen == [2]
    assert out[0] is None and out[1] is None
    res = out[2]
    assert int(res.info.status_val) == qt.SOLVED
    Q, q, A, l, u = problems[-1]
    x, y = np.asarray(res.x), np.asarray(res.y)
    Ax = A @ x
    assert np.max(np.abs(Ax - np.clip(Ax + y, l, u))) <= 1e-6
    assert np.max(np.abs(Q @ x + q + A.T @ y)) <= 1e-6
    # resumed iteration count is warm-ladder-sized, not a cold crawl
    ref = qt.solve_continuation(problems, s, prolong=prolong,
                                return_all=True)
    assert int(res.info.iterations) <= 2 * int(ref[2].info.iterations) + 10
