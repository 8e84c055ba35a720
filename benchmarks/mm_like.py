"""Maros-Mészáros-faithful benchmark suite (offline stand-in).

The reference method's headline benchmark is the Maros-Mészáros suite
(reference README.md:11-24 cites De Marchi 2022, which reports
solved-within-tolerance rates vs OSQP/QPALM).  The real QPS files are not
available in this offline environment (they drop in via ``QPDO_MM_DIR``,
see run.py:bench_maros) — this module reproduces the *suite's
distribution* instead, so a solved-rate at eps 1e-6 over >= 50 instances
is measured against problems with the same structural pathologies:

- **CVXQP-like**:   sparse SPD Q (band + off-band), equality-heavy
                    (m_eq = n/2 or n/4), box bounds; n up to 10,000.
- **LISWET-like**:  least-squares objective (Q = I + eps), n-2 one-sided
                    "wedge" second-difference constraints; n up to 10,000.
- **AUG2D-like**:   grid-Laplacian equality constraints, diagonal Q,
                    singular blocks (rank-deficient Q on half the grid).
- **QBAND-like**:   banded rank-deficient Q, box bounds, active-set-heavy.
- **DUAL-like**:    small dense ill-conditioned Q (cond ~ 1e6), simplex
                    constraint + bounds.
- **HS-like**:      tiny dense problems (n <= 20), mixed senses.
- **SCALE-stress**: any of the above with rows/cols scaled by 10^{+-4}
                    (exercises Ruiz equilibration, scaling.c:36-88).
- **DEGEN**:        duplicated equality rows (rank-deficient A),
                    fixed variables (l = u).

Usage:  python benchmarks/mm_like.py [--count N] [--max-n N] [--qps-dir D]
Prints one JSON line per family and a final summary line; exits nonzero
if the overall solved rate is below 0.9.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# Instance generators (each returns (name, Q, q, A, l, u) with sparse Q/A)
# ---------------------------------------------------------------------------

def gen_cvxqp(rng, n, eq_frac):
    """CVXQP{1,2,3}-style: sparse SPD Q, m = eq_frac*n equality rows."""
    m = max(1, int(n * eq_frac))
    diag = 1.0 + rng.random(n)
    off = sps.diags(0.3 * rng.standard_normal(n - 1), 1, shape=(n, n))
    far = sps.random(n, n, density=min(2.0 / n, 0.05), random_state=rng.integers(2**31))
    Qh = off + 0.1 * far
    Q = (sps.diags(diag) + Qh + Qh.T).tocsr()
    # make strictly diagonally dominant -> PSD
    rowsum = np.abs(Q).sum(axis=1).A.ravel() - np.abs(Q.diagonal())
    Q = (Q + sps.diags(np.maximum(rowsum - Q.diagonal() + 0.1, 0.0))).tocsr()
    A = sps.random(m, n, density=min(6.0 / n, 0.5), random_state=rng.integers(2**31),
                   data_rvs=rng.standard_normal).tocsr()
    # ensure no empty rows
    A = A + sps.csr_matrix((rng.standard_normal(m),
                            (np.arange(m), rng.integers(0, n, m))), shape=(m, n))
    x_feas = rng.standard_normal(n) * 0.5
    b = A @ x_feas
    # equality rows + box bounds on variables
    I = sps.eye(n, format="csr")
    A_full = sps.vstack([A, I]).tocsr()
    l = np.concatenate([b, -2.0 * np.ones(n)])
    u = np.concatenate([b, 2.0 * np.ones(n)])
    q = rng.standard_normal(n)
    return Q, q, A_full, l, u


def gen_liswet(rng, n):
    """LISWET-style: min 0.5||x - d||^2 s.t. x_{i} - 2x_{i+1} + x_{i+2} >= 0."""
    Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
    t = np.linspace(0, 1, n)
    d = np.sin(4 * np.pi * t) + 0.1 * rng.standard_normal(n)
    q = -d
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
    l = np.zeros(m)
    u = np.full(m, np.inf)
    return Q, q, A, l, u


def gen_aug2d(rng, k):
    """AUG2D-style: k*k grid Laplacian equality constraints, diagonal Q
    rank-deficient on half the variables."""
    n = k * k
    diag = np.where(rng.random(n) < 0.5, 1.0, 0.0) + 1e-6
    Q = sps.diags(diag).tocsr()
    # 5-point Laplacian rows as equalities on interior points
    idx = lambda i, j: i * k + j
    rows, cols, vals, b = [], [], [], []
    r = 0
    for i in range(1, k - 1):
        for j in range(1, k - 1):
            rows += [r] * 5
            cols += [idx(i, j), idx(i - 1, j), idx(i + 1, j),
                     idx(i, j - 1), idx(i, j + 1)]
            vals += [4.0, -1.0, -1.0, -1.0, -1.0]
            b.append(rng.standard_normal() * 0.1)
            r += 1
    A = sps.csr_matrix((vals, (rows, cols)), shape=(r, n))
    I = sps.eye(n, format="csr")
    A_full = sps.vstack([A, I]).tocsr()
    b = np.asarray(b)
    l = np.concatenate([b, -5.0 * np.ones(n)])
    u = np.concatenate([b, 5.0 * np.ones(n)])
    q = rng.standard_normal(n) * 0.1
    return Q, q, A_full, l, u


def gen_qband(rng, n, bw=5):
    """Banded rank-deficient Q (Gram of a band matrix), box bounds."""
    bands = [rng.standard_normal(n - abs(o)) for o in range(bw)]
    Bm = sps.diags(bands, offsets=list(range(bw)), shape=(n, n))
    Q = (Bm.T @ Bm).tocsr()          # rank-deficient possible, PSD
    q = rng.standard_normal(n)
    I = sps.eye(n, format="csr")
    l = -np.ones(n)
    u = np.ones(n)
    return Q, q, I, l, u


def gen_cont(rng, k, alpha=1e-2, ubox=1.0):
    """CONT-style PDE-constrained control on a k*k grid (the CONT-050/100
    family shape): minimize 0.5||y - yd||^2 + alpha/2 ||u||^2 subject to
    the discrete Poisson equality L y - h^2 u = b at every grid point
    (Dirichlet zero boundary folded into b) plus boxes on u and y.

    Variables interleave (y_p, u_p) per grid point so the KKT bandwidth is
    ~2k and the banded direct Newton backend applies.  The y-box is
    anchored at a feasibility witness (u* in the control box, y* = the
    PDE solve at u*), so the instance is feasible by construction while
    the bounds still bind near the optimum.
    """
    import scipy.sparse.linalg as spla

    n_grid = k * k
    h2 = 1.0 / (k + 1) ** 2
    t = (np.arange(k) + 1) / (k + 1)
    yd = (np.sin(np.pi * t)[:, None] * np.sin(np.pi * t)[None, :]).ravel()

    # 5-point Laplacian L on the full grid (zero Dirichlet outside)
    p = np.arange(n_grid)
    i, j = p // k, p % k
    rows, cols, vals = [p], [p], [np.full(n_grid, 4.0)]
    for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        ii, jj = i + di, j + dj
        keep = (ii >= 0) & (ii < k) & (jj >= 0) & (jj < k)
        rows.append(p[keep])
        cols.append(ii[keep] * k + jj[keep])
        vals.append(np.full(keep.sum(), -1.0))
    L = sps.csr_matrix((np.concatenate(vals),
                        (np.concatenate(rows), np.concatenate(cols))),
                       shape=(n_grid, n_grid))

    b = 0.1 * rng.standard_normal(n_grid)
    u_star = rng.uniform(-0.5 * ubox, 0.5 * ubox, n_grid)
    y_star = spla.spsolve(L.tocsc(), h2 * u_star + b)
    margin = 0.05 * (np.abs(y_star).max() + 1.0)
    y_lo, y_hi = y_star - margin, y_star + margin

    # interleaved order z = (y_0, u_0, y_1, u_1, ...)
    n = 2 * n_grid
    Q = sps.diags(np.where(np.arange(n) % 2 == 0, 1.0, alpha)).tocsr()
    q = np.zeros(n)
    q[0::2] = -yd
    Lc = L.tocoo()
    A_eq = sps.csr_matrix(
        (np.concatenate([Lc.data, np.full(n_grid, -h2)]),
         (np.concatenate([Lc.row, p]),
          np.concatenate([2 * Lc.col, 2 * p + 1]))), shape=(n_grid, n))
    I = sps.eye(n, format="csr")
    A = sps.vstack([A_eq, I]).tocsr()
    lo = np.empty(n)
    hi = np.empty(n)
    lo[0::2], hi[0::2] = y_lo, y_hi
    lo[1::2], hi[1::2] = -ubox, ubox
    l = np.concatenate([b, lo])
    u = np.concatenate([b, hi])
    return Q, q, A, l, u


def gen_gouldqp(rng, n):
    """GOULDQP2/3-style spring-chain QP: tridiagonal SPD Q (spring
    stiffness), bidiagonal difference rows x_{i+1} - x_i in a band, and
    variable boxes — feasibility anchored at a cumulative witness."""
    main = 2.0 + rng.random(n)
    off = -(0.5 + 0.4 * rng.random(n - 1))
    Q = sps.diags([off, main, off], (-1, 0, 1)).tocsr()
    # strict diagonal dominance -> SPD
    target = rng.standard_normal(n) * 0.5
    q = -(Q @ target)

    m = n - 1
    D = sps.diags([-np.ones(m), np.ones(m)], (0, 1),
                  shape=(m, n)).tocsr()
    # anchor the difference band at a feasible witness
    x_w = np.cumsum(rng.uniform(-0.05, 0.05, n))
    d_w = np.diff(x_w)
    band = 0.02 + 0.05 * rng.random(m)
    l_d = d_w - band
    u_d = d_w + band
    I = sps.eye(n, format="csr")
    A = sps.vstack([D, I]).tocsr()
    lo_x = x_w - 1.0
    hi_x = x_w + 1.0
    return Q, q, A, np.concatenate([l_d, lo_x]), np.concatenate([u_d, hi_x])


def gen_dual(rng, n):
    """DUALC-style: small dense ill-conditioned Q, simplex + bounds."""
    U = np.linalg.qr(rng.standard_normal((n, n)))[0]
    ev = np.logspace(-6, 0, n)
    Q = sps.csr_matrix(U @ np.diag(ev) @ U.T)
    q = rng.standard_normal(n) * 0.1
    ones = sps.csr_matrix(np.ones((1, n)))
    I = sps.eye(n, format="csr")
    A = sps.vstack([ones, I]).tocsr()
    l = np.concatenate([[1.0], np.zeros(n)])
    u = np.concatenate([[1.0], np.ones(n)])
    return Q, q, A, l, u


def gen_hs(rng, n):
    """HS-style tiny dense problems with mixed senses."""
    M = rng.standard_normal((n, n))
    Q = sps.csr_matrix(M @ M.T / n + 0.01 * np.eye(n))
    q = rng.standard_normal(n)
    m = max(2, n // 2)
    A = sps.csr_matrix(rng.standard_normal((m, n)))
    l = -rng.random(m) - 0.1
    u = rng.random(m) + 0.1
    sense = rng.integers(0, 3, m)
    l = np.where(sense == 1, -np.inf, l)
    u = np.where(sense == 2, np.inf, u)
    keep = ~(np.isinf(l) & np.isinf(u))
    if not keep.all():
        A, l, u = A[keep], l[keep], u[keep]
    return Q, q, A, np.minimum(l, u), np.maximum(l, u)


def apply_scale_stress(rng, Q, q, A, l, u):
    """Scale columns/rows by 10^{+-4}: the Ruiz equilibration stress."""
    n = Q.shape[0]
    m = A.shape[0]
    dc = 10.0 ** rng.uniform(-4, 4, n)
    dr = 10.0 ** rng.uniform(-2, 2, m)
    Dc = sps.diags(dc)
    Dr = sps.diags(dr)
    # substituting x = Dc z: Q<-DcQDc, q<-Dc q, A<-Dr A Dc, bounds<-Dr l/u
    return ((Dc @ Q @ Dc).tocsr(), dc * q, (Dr @ A @ Dc).tocsr(),
            dr * l, dr * u)


def apply_degeneracy(rng, Q, q, A, l, u):
    """Duplicate 20% of rows (rank-deficient A) and fix 5% of variables.

    The fixing values are anchored at a feasibility witness (the min-norm
    solution of the equality rows, or 0 when there are none) so the
    stressed instance stays FEASIBLE: random fixing values combined with
    equality rows + boxes made large instances genuinely primal
    infeasible — the solver then returned a numerically valid Farkas
    certificate which the harness miscounted as a miss
    (logs/mm_like_regression_r2late.log CVXQP1D029)."""
    from scipy.sparse.linalg import lsqr

    m, n = A.shape
    k = max(1, m // 5)
    pick = rng.integers(0, m, k)
    A2 = sps.vstack([A, A[pick]]).tocsr()
    l2 = np.concatenate([l, l[pick]])
    u2 = np.concatenate([u, u[pick]])

    eq = np.isfinite(l) & (l == u)
    if eq.any():
        anchor = lsqr(A[eq], l[eq], atol=1e-12, btol=1e-12)[0]
    else:
        anchor = np.zeros(n)
    Ax = A @ anchor
    assert np.all(Ax >= l - 1e-6) and np.all(Ax <= u + 1e-6), \
        "degeneracy anchor is not feasible for the base instance"

    nfix = max(1, n // 20)
    vfix = rng.integers(0, n, nfix)
    vals = anchor[vfix]
    F = sps.csr_matrix((np.ones(nfix), (np.arange(nfix), vfix)), shape=(nfix, n))
    return Q, q, sps.vstack([A2, F]).tocsr(), \
        np.concatenate([l2, vals]), np.concatenate([u2, vals])


def build_suite(rng, max_n):
    """~60 instances spanning the MM size/structure distribution."""
    suite = []

    def add(family, gen, *args, stress=None):
        Q, q, A, l, u = gen(rng, *args)
        if stress == "scale":
            Q, q, A, l, u = apply_scale_stress(rng, Q, q, A, l, u)
        elif stress == "degen":
            Q, q, A, l, u = apply_degeneracy(rng, Q, q, A, l, u)
        name = f"{family}{len(suite):03d}"
        suite.append((name, family, Q, q, A, l, u))

    for n in (50, 200, 500, 1000, 2500, 5000, 10000):
        if n > max_n:
            continue
        add("CVXQP1", gen_cvxqp, n, 0.5)
        add("CVXQP2", gen_cvxqp, n, 0.25)
    for n in (500, 2000, 5000, 10000):
        if n > max_n:
            continue
        add("LISWET", gen_liswet, n)
    for k in (8, 16, 32, 64):
        if k * k > max_n:
            continue
        add("AUG2D", gen_aug2d, k)
    for n in (100, 1000, 5000):
        if n > max_n:
            continue
        add("QBAND", gen_qband, n)
    for k in (10, 22, 32, 50):
        if 2 * k * k > max_n:
            continue
        add("CONT", gen_cont, k)
    for n in (350, 3500, 10000):
        if n > max_n:
            continue
        add("GOULDQP", gen_gouldqp, n)
    for n in (10, 30, 85, 200):
        add("DUALC", gen_dual, n)
    for n in (3, 5, 10, 20):
        add("HS", gen_hs, n)
    # stressed variants
    for n in (100, 1000, 5000):
        if n > max_n:
            continue
        add("CVXQP1S", gen_cvxqp, n, 0.5, stress="scale")
        add("QBANDS", gen_qband, n, stress="scale")
    for n in (100, 1000):
        if n > max_n:
            continue
        add("CVXQP1D", gen_cvxqp, n, 0.5, stress="degen")
        add("HSD", gen_hs, min(n, 20), stress="degen")
    return suite


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=0,
                    help="truncate the suite (0 = all)")
    ap.add_argument("--start-at", type=int, default=0,
                    help="skip instances with index < this (resume a run; "
                         "the final summary then covers only the resumed "
                         "rows — merge logs for the suite-wide rate)")
    ap.add_argument("--summarize-log", type=str, default="",
                    help="recompute the suite summary from a merged "
                         "JSON-lines log and exit")
    ap.add_argument("--max-n", type=int,
                    default=int(os.environ.get("QPDO_MM_MAX_N", 10000)))
    ap.add_argument("--qps-roundtrip", type=int, default=3,
                    help="additionally round-trip this many instances "
                         "through QPS files (full ingest pipeline)")
    ap.add_argument("--eps", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=30000,
                    help="outer iteration cap (LISWET n=10k needs ~100k; "
                         "see RESULTS.md)")
    ap.add_argument("--ruiz-kkt", action="store_true",
                    help="equilibrate Q jointly with A (Settings.ruiz_kkt) "
                         "instead of reference-parity A-only Ruiz — the "
                         "scale-stressed families' fix")
    ap.add_argument("--families", type=str, default="",
                    help="comma-separated family filter (e.g. "
                         "QBAND,GOULDQP,CONT for the banded on-TPU run)")
    args = ap.parse_args(argv)

    if args.summarize_log:
        fams = {}
        rows = []
        with open(args.summarize_log) as fh:
            for line in fh:
                r = json.loads(line)
                if "name" not in r:
                    continue
                rows.append(r)
                fam = r["name"].rstrip("0123456789")
                f = fams.setdefault(fam, [0, 0])
                f[0] += bool(r["verified"])
                f[1] += 1
        summary = {
            "suite": "mm_like",
            "instances": len(rows),
            "solved_verified": sum(r["verified"] for r in rows),
            "solve_rate": round(sum(r["verified"] for r in rows)
                                / max(len(rows), 1), 4),
            "eps": args.eps,
            "max_n": max(r["n"] for r in rows),
            "total_time_s": round(sum(r["time_s"] for r in rows), 1),
            "per_family": {k: f"{v[0]}/{v[1]}" for k, v in sorted(fams.items())},
        }
        print(json.dumps(summary), flush=True)
        return 0 if summary["solve_rate"] >= 0.9 else 1

    import jax
    # Correctness metric, not throughput: run CPU/f64 (fast compiles).
    # The axon TPU pins itself via sitecustomize, so override in-process;
    # set QPDO_MM_TPU=1 to run on the attached TPU instead.
    if not os.environ.get("QPDO_MM_TPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import qpdo_tpu as qt

    rng = np.random.default_rng(42)
    suite = build_suite(rng, args.max_n)
    if args.families:
        keep = set(args.families.split(","))
        suite = [s for s in suite if s[1] in keep]
    if args.start_at:
        suite = suite[args.start_at:]
    if args.count:
        suite = suite[: args.count]

    # LISWET-family instances legitimately need ~n iterations (the
    # active-set crawl, shared with the reference); with the banded direct
    # Newton backend each iteration is cheap, so the honest bound is the
    # wall-clock cap, not the reference's 1e4 default iteration cap
    # (constants.h:45).  A capped instance counts as unsolved — reported
    # honestly, never hidden.
    settings = qt.Settings(eps_abs=args.eps, max_iter=args.max_iter,
                           inner_max_iter=100, eps_abs_in=0.1,
                           rho=0.02, delta=0.1, max_time=1800.0,
                           precond_block=64, ruiz_kkt=args.ruiz_kkt)
    if os.environ.get("QPDO_MM_TPU") or os.environ.get("QPDO_MM_F32CFG"):
        # TPU-safe precision: every factorization (banded direct, block-
        # Jacobi preconditioner) in float32 — a float64 Cholesky on the
        # axon chip is the documented device-crash path — with float64
        # state + refinement recovering eps_abs (tpu_banded_cr.py numbers).
        # QPDO_MM_F32CFG=1 applies the same config on CPU (a rehearsal of
        # the TPU precision mode without touching the chip).
        # mu_min 1e-9 (the reference default, constants.h:55) is the
        # recorded config since round 5: the CVXQP1S 3,459-iteration
        # tail that round 4 attributed to the 1e-9 floor is floor-
        # INDEPENDENT (bit-identical trajectory at 1e-7 — mu never
        # shrinks below 1.1e-4 on that instance; the tail is the
        # scale-stress/A-only-Ruiz mu-schedule freeze, fixed 51x by
        # --ruiz-kkt; scripts/cvxqp1s_diag.py, RESULTS.md round 5), and
        # the state-dtype escalation carries 1e-9 on-device (round 4).
        settings = settings.replace(
            kkt_dtype="float32",
            mu_min=float(os.environ.get("QPDO_MM_MU_MIN", "1e-9")),
            precond_dtype="float32",
            cg_dtype="float32", refine_steps=3)

    per_family = {}
    rows = []
    t_suite = time.perf_counter()
    for name, family, Q, q, A, l, u in suite:
        t0 = time.perf_counter()
        res = qt.solve_sparse(Q, q, A, l, u, settings=settings)
        st = int(res.info.status_val)
        dt = time.perf_counter() - t0
        ok = st == qt.SOLVED
        # independent KKT oracle (demo_mex.m:39-42): trust but verify
        if ok:
            x, y = np.asarray(res.x), np.asarray(res.y)
            rp = np.max(np.abs(A @ x - np.clip(A @ x + y, l, u)))
            rd = np.max(np.abs(Q @ x + q + A.T @ y))
            ok = bool(rp < 10 * args.eps and rd < 10 * args.eps)
        f = per_family.setdefault(family, [0, 0])
        f[0] += ok
        f[1] += 1
        rows.append({"name": name, "n": Q.shape[0], "m": A.shape[0],
                     "status": st, "verified": ok,
                     "iters": int(res.info.iterations), "time_s": round(dt, 2)})
        print(json.dumps(rows[-1]), flush=True)

    # QPS round-trip on a few instances: write -> native parse -> solve
    qps_ok = 0
    if args.qps_roundtrip:
        import tempfile
        from qpdo_tpu.io import write_qps, read_qps, to_problem
        try:
            from qpdo_tpu.native import read_qps_native as reader
        except Exception:
            reader = read_qps
        small = [s for s in suite if s[2].shape[0] <= 500][: args.qps_roundtrip]
        with tempfile.TemporaryDirectory() as d:
            for name, family, Q, q, A, l, u in small:
                p = qt.make_problem(np.asarray(Q.todense()), q,
                                    np.asarray(A.todense()), l, u)
                path = os.path.join(d, f"{name}.qps")
                write_qps(p, path, name=name)
                p2 = to_problem(reader(path))
                res = qt.solve(p2, settings=settings)
                qps_ok += int(res.info.status_val) == qt.SOLVED

    total = len(rows)
    solved = sum(r["verified"] for r in rows)
    summary = {
        "suite": "mm_like",
        "instances": total,
        "solved_verified": solved,
        "solve_rate": round(solved / max(total, 1), 4),
        "eps": args.eps,
        "max_n": max(r["n"] for r in rows),
        "total_time_s": round(time.perf_counter() - t_suite, 1),
        "qps_roundtrip_solved": qps_ok,
        "per_family": {k: f"{v[0]}/{v[1]}" for k, v in
                       sorted(per_family.items())},
    }
    print(json.dumps(summary), flush=True)
    return 0 if summary["solve_rate"] >= 0.9 else 1


if __name__ == "__main__":
    sys.exit(main())
