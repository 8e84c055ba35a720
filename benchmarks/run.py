"""Benchmark/acceptance harness: the five BASELINE.json configs.

Usage:  python benchmarks/run.py [config ...]
Configs: demo, infeasibility, degenerate, maros (needs QPDO_MM_DIR pointing
at a directory of .qps/.qps.gz files), mpc.  Default: all available.

Prints one JSON line per config; the headline single-line benchmark for the
driver remains bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(res):
    np.asarray(res.info.status_val)
    return res


def make_batch(B, n, m, seed=0, dtype=np.float64, rank_frac=1.0):
    import jax.numpy as jnp
    import qpdo_tpu as qt

    rng = np.random.default_rng(seed)
    k = max(1, int(n * rank_frac))
    M = rng.standard_normal((B, n, k))
    Q = np.einsum("bik,bjk->bij", M, M) / n
    if rank_frac >= 1.0:
        Q += 0.1 * np.eye(n)
    return qt.Problem(
        Q=jnp.asarray(Q, dtype), q=jnp.asarray(rng.standard_normal((B, n)), dtype),
        A=jnp.asarray(rng.standard_normal((B, m, n)), dtype),
        l=jnp.asarray(-rng.random((B, m)), dtype),
        u=jnp.asarray(rng.random((B, m)), dtype),
        c=jnp.zeros((B,), dtype))


def bench_demo():
    """Config 1: demo_mex-style batched random QPs, eps 1e-6, cold."""
    import jax.numpy as jnp
    import qpdo_tpu as qt
    from qpdo_tpu.parallel.batch import _solve_batch

    B, n, m = 256, 100, 150
    p = make_batch(B, n, m)
    s = qt.Settings(eps_abs=1e-6, max_iter=300, inner_max_iter=50,
                    eps_abs_in=0.1, rho=0.02, delta=0.1,
                    refine_steps=2, kkt_dtype="float32", hybrid_warmup=True,
                    mu_min=1e-7, cert_dtype="float32", warmup_eps=1e-3,
                    linesearch="bisect", linesearch_dtype="float32",
                    phase2_gemm_dtype="float32", hard_rows=8,
                    anchor_every=10, polish=True)
    run = lambda: _sync(_solve_batch(p, s, None, None, False, False))
    res = run()
    t0 = time.perf_counter()
    res = run()
    dt = time.perf_counter() - t0
    st = np.asarray(res.info.status_val)
    return {"config": "demo", "qps_per_sec": round(B / dt, 1),
            "solved_fraction": float((st == 1).mean()),
            "mean_iters": float(np.asarray(res.info.iterations).mean())}


def bench_infeasibility():
    """Config 2: status + certificate detection on the three acceptance QPs
    (examples/infeasibility_tests.m)."""
    import qpdo_tpu as qt

    def prob(a, b, c):
        Q = np.array([[1.0, 0.0], [0.0, 0.0]])
        q = np.array([1.0, c])
        A = np.array([[a, a], [1.0, 0.0], [0.0, 1.0]])
        return qt.make_problem(Q, q, A, [-np.inf, 1, 1], [0.0, 3, b])

    s = qt.Settings(max_iter=100)
    results = [int(qt.solve(prob(0.0, 3.0, 0.0), s).info.status_val),
               int(qt.solve(prob(1.0, 3.0, 0.0), s).info.status_val),
               int(qt.solve(prob(0.0, np.inf, -1.0), s).info.status_val)]
    ok = results == [qt.SOLVED, qt.PRIMAL_INFEASIBLE, qt.DUAL_INFEASIBLE]
    return {"config": "infeasibility", "statuses": results, "pass": bool(ok)}


def bench_degenerate():
    """Config 3: rank-deficient Q (rank n/2), redundant duplicated rows."""
    import jax.numpy as jnp
    import qpdo_tpu as qt
    from qpdo_tpu.parallel.batch import _solve_batch

    B, n, m = 64, 80, 60
    p = make_batch(B, n, m, seed=7, rank_frac=0.5)
    A = np.array(p.A)
    A[:, m // 2:, :] = A[:, : m - m // 2, :]   # duplicate rows -> redundancy
    # box rows on all variables keep the problem bounded (rank-deficient Q
    # with an unconstrained null direction is genuinely dual infeasible)
    I = np.broadcast_to(np.eye(n), (B, n, n))
    A_full = np.concatenate([A, I], axis=1)
    l_full = np.concatenate([np.asarray(p.l), -2.0 * np.ones((B, n))], axis=1)
    u_full = np.concatenate([np.asarray(p.u), 2.0 * np.ones((B, n))], axis=1)
    p = p._replace(A=jnp.asarray(A_full), l=jnp.asarray(l_full),
                   u=jnp.asarray(u_full))
    s = qt.Settings(eps_abs=1e-6, max_iter=400, inner_max_iter=50,
                    eps_abs_in=0.1, rho=0.02, delta=0.1,
                    refine_steps=2, kkt_dtype="float32", hybrid_warmup=True,
                    mu_min=1e-7, cert_dtype="float32", warmup_eps=1e-3,
                    linesearch="bisect", linesearch_dtype="float32",
                    phase2_gemm_dtype="float32", hard_rows=8,
                    anchor_every=10, polish=True)
    res = _sync(_solve_batch(p, s, None, None, False, False))
    st = np.asarray(res.info.status_val)
    return {"config": "degenerate", "solved_fraction": float((st == 1).mean()),
            "mean_iters": float(np.asarray(res.info.iterations).mean())}


def bench_mpc():
    """Config 5: warm-started scenario re-solves (MPC workflow):
    solve a batch cold, perturb q/bounds slightly, re-solve warm."""
    import jax.numpy as jnp
    import qpdo_tpu as qt
    from qpdo_tpu.parallel.batch import _solve_batch

    B, n, m = 256, 100, 150
    p = make_batch(B, n, m, seed=3)
    s = qt.Settings(eps_abs=1e-6, max_iter=300, inner_max_iter=50,
                    eps_abs_in=0.1, rho=0.02, delta=0.1,
                    refine_steps=2, kkt_dtype="float32", hybrid_warmup=True,
                    mu_min=1e-7, cert_dtype="float32", warmup_eps=1e-3,
                    linesearch="bisect", linesearch_dtype="float32",
                    phase2_gemm_dtype="float32", hard_rows=8,
                    anchor_every=10, polish=True)
    cold = _sync(_solve_batch(p, s, None, None, False, False))
    rng = np.random.default_rng(4)
    p2 = p._replace(q=p.q + 1e-3 * jnp.asarray(rng.standard_normal((B, n))))
    x0 = cold.x
    y0 = cold.y
    # warm re-solve on the direct path: the pre-loop verified polish
    # finishes unchanged-active-set problems in zero iterations
    sw = s.replace(hybrid_warmup=False)
    run = lambda: _sync(_solve_batch(p2, sw, x0, y0, True, True))
    warm = run()
    t0 = time.perf_counter()
    warm = run()
    dt = time.perf_counter() - t0
    st = np.asarray(warm.info.status_val)
    return {"config": "mpc_warm", "qps_per_sec": round(B / dt, 1),
            "solved_fraction": float((st == 1).mean()),
            "mean_iters_warm": float(np.asarray(warm.info.iterations).mean()),
            "mean_iters_cold": float(np.asarray(cold.info.iterations).mean())}


def bench_structured():
    """Block-angular (scenario) solve via the distributed arrow-KKT path."""
    import jax
    import jax.numpy as jnp
    import qpdo_tpu as qt
    from qpdo_tpu.solver.structured import (BlockAngularProblem,
                                            solve_block_angular)

    rng = np.random.default_rng(0)
    S, ms, n0, ns = 32, 24, 16, 24
    M0 = rng.standard_normal((n0, n0)) / np.sqrt(n0)
    Ms = rng.standard_normal((S, ns, ns)) / np.sqrt(ns)
    p = BlockAngularProblem(
        Q0=jnp.asarray(M0 @ M0.T + 0.5 * np.eye(n0)),
        Qs=jnp.asarray(np.einsum("sij,skj->sik", Ms, Ms) + 0.5 * np.eye(ns)),
        q0=jnp.asarray(rng.standard_normal(n0)),
        qs=jnp.asarray(rng.standard_normal((S, ns))),
        T=jnp.asarray(rng.standard_normal((S, ms, n0)) * 0.5),
        W=jnp.asarray(rng.standard_normal((S, ms, ns))),
        l=jnp.asarray(-rng.random((S, ms)) - 0.1),
        u=jnp.asarray(rng.random((S, ms)) + 0.1),
        c=jnp.asarray(0.0))
    s = qt.Settings(scaling=0, eps_prim_inf=0.0, eps_dual_inf=0.0,
                    max_iter=500)
    f = jax.jit(lambda pp: solve_block_angular(pp, s))
    x0, xs, y, info = f(p)
    np.asarray(info.status_val)
    t0 = time.perf_counter()
    x0, xs, y, info = f(p)
    np.asarray(info.status_val)
    dt = time.perf_counter() - t0
    n_total = n0 + S * ns
    return {"config": "structured", "status": int(info.status_val),
            "iters": int(info.iterations), "n_total": n_total,
            "scenarios": S, "solve_time_s": round(dt, 3)}


def generate_suite(out_dir: str, count: int = 12, seed: int = 0) -> None:
    """Generate a local Maros-Mészáros-style QPS suite: random convex QPs of
    assorted sizes, conditioning, sparsity and bound structure, written in
    QPS format (exercises the full ingest pipeline).  Alongside the small
    dense instances, reference-scale sparse instances (n = 3500-8000, the
    MM suite's upper size range) are written from the mm_like structured
    generators — these route through the native sparse parse +
    ``solve_sparse`` path in bench_maros."""
    import qpdo_tpu as qt
    from qpdo_tpu.io import write_qps

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    _generate_large_sparse(out_dir, rng, write_qps)
    for k in range(count):
        n = int(rng.integers(20, 150))
        m = int(rng.integers(10, 2 * n))
        density = float(rng.choice([0.1, 0.3, 1.0]))
        rank = n if rng.random() < 0.5 else max(1, n // 2)
        M = rng.standard_normal((n, rank))
        Q = M @ M.T / n + (0.1 if rank == n else 0.0) * np.eye(n)
        A = rng.standard_normal((m, n)) * (rng.random((m, n)) < density)
        l = -rng.random(m) - 0.1
        u = rng.random(m) + 0.1
        eq = rng.random(m) < 0.2
        l[eq] = u[eq] = rng.standard_normal(eq.sum()) * 0.1
        onesided = rng.random(m) < 0.2
        u[onesided & (rng.random(m) < 0.5)] = np.inf
        l[onesided & ~(rng.random(m) < 0.5)] = -np.inf
        l2 = np.minimum(l, u)
        u2 = np.maximum(l, u)
        if rank < n:  # keep rank-deficient instances bounded
            A = np.vstack([A, np.eye(n)])
            l2 = np.concatenate([l2, -3 * np.ones(n)])
            u2 = np.concatenate([u2, 3 * np.ones(n)])
        p = qt.make_problem(Q, rng.standard_normal(n), A, l2, u2)
        path = os.path.join(out_dir, f"gen{k:03d}.qps")
        if not os.path.exists(path):  # additive: seeded -> same content
            write_qps(p, path, name=f"GEN{k:03d}")


def _generate_large_sparse(out_dir: str, rng, write_qps) -> None:
    """Reference-scale sparse QPS instances for the ingest suite (the MM
    paper benchmarks reach n ~ 1e4; round-2's generated files were n <= 150
    toys).  Uses the mm_like structured generators so the instances carry
    real MM-family structure, not just random sparsity."""
    import scipy.sparse as sps

    from qpdo_tpu.io.qps import QPSData
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mm_like import gen_gouldqp, gen_qband

    def emit(name, Q, q, A, l, u):
        path = os.path.join(out_dir, f"{name.lower()}.qps")
        if os.path.exists(path):  # additive top-up of an existing suite
            return
        data = QPSData(Q=sps.csc_matrix(Q), q=np.asarray(q),
                       A=sps.csc_matrix(A), l=np.asarray(l),
                       u=np.asarray(u), c=0.0, name=name,
                       n_structural=Q.shape[0])
        write_qps(data, path, name=name)

    emit("BIGGQP", *gen_gouldqp(rng, 5000))
    emit("BIGQBAND", *gen_qband(rng, 5000))
    # random general sparse at n=8000 (the cg_traj structure, larger)
    n, m = 8000, 6000
    B = sps.random(n, n, density=4.0 / n, random_state=31, format="csr")
    Q = (B.T @ B + 0.1 * sps.eye(n)).tocsr()
    A = sps.random(m, n, density=6.0 / n, random_state=32, format="csr")
    emit("BIGRAND", Q, rng.standard_normal(n), A,
         -rng.random(m), rng.random(m))
    # reference-top-end banded instances (the MM suite reaches n ~ 9e4;
    # round-3's largest generated files stopped at n=8000): these route
    # through the native sparse parse onto the banded direct path
    # (round-4; solved on-TPU by scripts/tpu_big_banded.py)
    rng2 = np.random.default_rng(77)
    emit("BIGGQP12K", *gen_gouldqp(rng2, 12000))
    emit("BIGQBAND20K", *gen_qband(rng2, 20000))
    # round-5 (verdict item 7): push the generated ingest suite to the
    # MM top-end sizes CHOLMOD handles routinely
    # (cholmod_interface.c:8-30 at n ~ 9e4) — banded/LISWET structure on
    # the banded direct path, drivable through solve_continuation
    from mm_like import gen_liswet
    rng3 = np.random.default_rng(91)
    emit("BIGQBAND35K", *gen_qband(rng3, 35000))
    emit("BIGLISWET50K", *gen_liswet(rng3, 50000))


def bench_maros():
    """Config 4: Maros-Mészáros subset from QPDO_MM_DIR; falls back to a
    generated local QPS suite when the env var is unset (no network in this
    environment — real MM files drop in via QPDO_MM_DIR).  Files with
    n <= QPDO_MM_MAX_N solve dense-batched (bucketed shapes); larger files
    parse sparse (read_qps_native(dense=False)) and solve one-by-one on the
    matrix-free sparse path — every solution is oracle-verified host-side."""
    import qpdo_tpu as qt
    from qpdo_tpu.io import read_qps, to_problem

    generated = False
    mm_dir = os.environ.get("QPDO_MM_DIR")
    if not mm_dir or not os.path.isdir(mm_dir):
        mm_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "generated_suite")
        # always call: generate_suite is additive (emit skips existing
        # files), so new reference-scale instances top up old suite dirs
        generate_suite(mm_dir)
        generated = True
    try:
        from qpdo_tpu.native import read_qps_native as reader
    except Exception:
        reader = read_qps

    import scipy.sparse as sps

    from qpdo_tpu.utils.padding import solve_heterogeneous

    files = sorted(f for f in os.listdir(mm_dir)
                   if f.endswith((".qps", ".QPS", ".qps.gz", ".SIF")))
    max_n = int(os.environ.get("QPDO_MM_MAX_N", 500))
    # default sparse-size cap on the axon worker: the BIGRAND n=8000
    # sustained-CG solve crashed it 4x on 2026-08-19 (fully-jitted AND
    # host-chunked; results are correct whenever it completes — a platform
    # fault, logs/bigrand_*_tpu*.log).  n <= 6000 ran clean repeatedly.
    # Override with QPDO_MM_SPARSE_MAX_N; CPU keeps the full range.
    import jax
    # CPU cap 40k: BIGQBAND35K (banded direct, minutes) is in range;
    # BIGLISWET50K is excluded — a COLD LISWET solve legitimately needs
    # ~n iterations (the active-set crawl) and belongs to the
    # continuation driver (scripts/tpu_liswet_qps_continuation.py), not
    # a 1500 s-capped one-shot that would read as an unsolved instance
    default_cap = 6000 if jax.default_backend() not in ("cpu",) else 40_000
    sparse_max_n = int(os.environ.get("QPDO_MM_SPARSE_MAX_N", default_cap))
    s = qt.Settings(eps_abs=1e-6, max_iter=2000, inner_max_iter=100,
                    eps_abs_in=0.1, rho=0.02, delta=0.1,
                    refine_steps=2, kkt_dtype="float32", hybrid_warmup=True,
                    # reference default (constants.h:55) since round 5: the
                    # mu floor is exonerated from the CVXQP1S tail
                    # (RESULTS.md round 5) and the escalation machinery
                    # carries 1e-9 on-device (round 4)
                    mu_min=float(os.environ.get("QPDO_MM_MU_MIN", "1e-9")))
    # TPU-safe sparse-path settings: float32 CG + preconditioner (a
    # float64 blocked Cholesky on the TPU is the device-crash path).
    # max_time forces host-driven 32-iteration chunking: a fully-jitted
    # multi-minute sparse solve streamed as ONE device execution crashed
    # the axon worker twice (BIGRAND n=8000, logs/maros_tpu_r3.log,
    # logs/bigrand_tpu_r3.log); chunked runs of the same machinery survive
    s_sparse = s.replace(max_iter=5000, refine_steps=3,
                         cg_dtype="float32", precond_dtype="float32",
                         precond_block=64, max_time=1500.0)

    def _kkt(Qm, qv, Am, lv, uv, x, y):
        Ax = Am @ x
        rp = float(np.max(np.abs(Ax - np.clip(Ax + y, lv, uv))))
        rd = float(np.max(np.abs(Qm @ x + qv + Am.T @ y)))
        return max(rp, rd)

    dense_probs, dense_data, sparse_jobs = [], [], []
    skipped_large = []
    for f in files:
        path = os.path.join(mm_dir, f)
        try:
            d = reader(path, dense=False)
        except TypeError:  # pure-Python fallback reader: dense only
            d = reader(path)
        n = d.Q.shape[0]
        if n <= max_n:
            if sps.issparse(d.Q):
                d = d.__class__(name=d.name, Q=d.Q.toarray(), q=d.q, c=d.c,
                                A=d.A.toarray(), l=d.l, u=d.u,
                                n_structural=d.n_structural)
            dense_probs.append(to_problem(d))
            dense_data.append(d)
        elif n <= sparse_max_n:
            sparse_jobs.append((f, d))
        else:
            # no silent caps: a size-capped run must not read as full
            # coverage (the default cap drops BIGRAND n=8000 on non-CPU
            # backends — see the crash-class note above)
            skipped_large.append({"file": f, "n": int(n)})
    if skipped_large:
        print(json.dumps({"skipped_for_size": skipped_large,
                          "sparse_max_n": sparse_max_n}), flush=True)
    t0 = time.perf_counter()
    # bucketed batched solving keeps the number of compiled shapes small
    # (compiles dominate on this platform: ~10 min per shape).
    # QPDO_MM_ONE_BUCKET=1 pads every instance to one (n, m) shape — a
    # single compile; the padding FLOPs are trivial next to a compile.
    if os.environ.get("QPDO_MM_ONE_BUCKET") and dense_probs:
        nmax = max(int(p.Q.shape[0]) for p in dense_probs)
        mmax = max(int(p.A.shape[0]) for p in dense_probs)
        results = solve_heterogeneous(dense_probs, s,
                                      n_mult=nmax, m_mult=mmax)
    else:
        results = solve_heterogeneous(dense_probs, s, n_mult=64, m_mult=64)
    solved = 0
    for r, d in zip(results, dense_data):
        ok = int(r.info.status_val) == qt.SOLVED
        if ok:  # trust but verify (demo_mex.m:39-42)
            ok = _kkt(np.asarray(d.Q), d.q, np.asarray(d.A), d.l, d.u,
                      np.asarray(r.x), np.asarray(r.y)) < 1e-5
        solved += ok
    # flush the dense outcome before the sparse jobs: a device crash mid-
    # sparse must not lose the dense evidence (it did on 2026-08-19)
    print(json.dumps({"dense_buckets_done": True,
                      "solved_dense": solved,
                      "attempted_dense": len(dense_probs),
                      "t_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    # reference-scale instances: matrix-free sparse path, one by one
    sparse_solved = 0
    for f, d in sparse_jobs:
        r = qt.solve_sparse(d.Q, d.q, d.A, d.l, d.u, d.c,
                            settings=s_sparse)
        ok = int(np.asarray(r.info.status_val)) == qt.SOLVED
        if ok:
            ok = _kkt(d.Q.tocsr(), d.q, d.A.tocsr(), d.l, d.u,
                      np.asarray(r.x), np.asarray(r.y)) < 1e-5
        sparse_solved += ok
        print(json.dumps({"file": f, "n": d.Q.shape[0],
                          "status": int(np.asarray(r.info.status_val)),
                          "iters": int(r.info.iterations),
                          "verified": bool(ok)}), flush=True)
    t_total = time.perf_counter() - t0
    attempted = len(dense_probs) + len(sparse_jobs)
    return {"config": "maros", "attempted": attempted,
            "solved": solved + sparse_solved,
            "solved_dense": solved, "attempted_dense": len(dense_probs),
            "solved_sparse": sparse_solved,
            "attempted_sparse": len(sparse_jobs),
            "solve_rate": (solved + sparse_solved) / max(attempted, 1),
            "total_time_s": round(t_total, 1),
            "skipped_large": len(skipped_large),
            "sparse_max_n": sparse_max_n,
            "generated_suite": generated}


CONFIGS = {"demo": bench_demo, "infeasibility": bench_infeasibility,
           "degenerate": bench_degenerate, "mpc": bench_mpc,
           "structured": bench_structured, "maros": bench_maros}


def main(argv):
    import jax
    jax.config.update("jax_enable_x64", True)
    names = argv or list(CONFIGS)
    for name in names:
        out = CONFIGS[name]()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
