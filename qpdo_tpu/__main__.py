"""Command-line solver:  python -m qpdo_tpu problem.qps [options]

Reads a QP in QPS/MPS format (the Maros-Mészáros container), solves it on
the matching path (dense or sparse-CG), and prints a one-line JSON result
plus, optionally, the solution vectors.  No reference equivalent — the
reference is library-only; this is the standard framework convenience on
top of io.read_qps + solve.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m qpdo_tpu",
        description="Solve a QPS/MPS convex QP with the qpdo_tpu solver.")
    p.add_argument("qps", nargs="+",
                   help="path(s) to QPS file(s); several files solve "
                        "sequentially with one JSON line each plus a "
                        "summary line (the Maros-Mészáros directory "
                        "workflow: python -m qpdo_tpu mm/*.QPS)")
    p.add_argument("--eps", type=float, default=1e-6,
                   help="absolute KKT tolerance (default 1e-6)")
    p.add_argument("--max-iter", type=int, default=10000)
    p.add_argument("--max-time", type=float, default=float("inf"),
                   help="wall-clock cap in seconds")
    p.add_argument("--sparse", action="store_true",
                   help="force the sparse-CG path (default: auto by size)")
    p.add_argument("--dense-max-n", type=int, default=1500,
                   help="densify below this n (default 1500)")
    p.add_argument("--ruiz-kkt", action="store_true",
                   help="joint Q/A KKT equilibration (wide-scale Q)")
    p.add_argument("--polish", action="store_true",
                   help="solution polish: exact active-set KKT solve, "
                        "verified per problem (dense path)")
    p.add_argument("--cpu", action="store_true",
                   help="run on CPU float64 (most accurate; TPU is the "
                        "default when attached)")
    p.add_argument("--verbose", action="store_true",
                   help="per-iteration table")
    p.add_argument("--print-solution", action="store_true",
                   help="also print x and y as JSON arrays")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from . import Settings
    from .io.qps import read_qps, solve_qps_data

    on_accelerator = jax.default_backend() != "cpu"

    settings = Settings(eps_abs=args.eps, max_iter=args.max_iter,
                        max_time=args.max_time, ruiz_kkt=args.ruiz_kkt,
                        polish=args.polish, verbose=args.verbose)
    if on_accelerator:
        # TPU-safe factorization precision: float64 Cholesky crashes the
        # axon device (CLAUDE.md / README "Precision model"); keep the
        # float64 state but factor in float32 with refinement
        settings = settings.replace(
            kkt_dtype="float32", refine_steps=2,
            mu_min=max(settings.mu_min, 1e-7),
            precond_dtype="float32")

    def solve_one(path: str) -> int:
        t0 = time.perf_counter()
        data = read_qps(path, dense=False)
        n = data.q.shape[0]
        use_sparse = args.sparse or n > args.dense_max_n
        if not use_sparse:
            import scipy.sparse as sps
            data = type(data)(
                name=data.name,
                Q=data.Q.toarray() if sps.issparse(data.Q) else data.Q,
                q=data.q, c=data.c,
                A=data.A.toarray() if sps.issparse(data.A) else data.A,
                l=data.l, u=data.u, n_structural=data.n_structural)
        parse_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = solve_qps_data(data, settings=settings)
        status = int(np.asarray(res.info.status_val))  # host sync
        solve_s = time.perf_counter() - t0

        out = {
            "name": data.name, "n": int(n), "m": int(data.l.shape[0]),
            "path": "sparse" if use_sparse else "dense",
            "status": res.info.status, "status_val": status,
            "iterations": int(res.info.iterations),
            "objective": float(res.info.objective),
            "res_prim": float(res.info.res_prim_norm),
            "res_dual": float(res.info.res_dual_norm),
            "parse_s": round(parse_s, 3), "solve_s": round(solve_s, 3),
        }
        print(json.dumps(out), flush=True)
        if args.print_solution:
            # NaN-filled solutions (infeasible statuses) stay valid JSON
            san = lambda v: [vi if np.isfinite(vi) else None
                             for vi in np.asarray(v).tolist()]
            print(json.dumps({"x": san(res.x), "y": san(res.y)}))
        return status

    statuses = [solve_one(path) for path in args.qps]
    solved = sum(st == 1 for st in statuses)
    if len(args.qps) > 1:
        print(json.dumps({"files": len(args.qps), "solved": solved,
                          "solve_rate": round(solved / len(args.qps), 4)}))
    return 0 if solved == len(args.qps) else 2


if __name__ == "__main__":
    sys.exit(main())
