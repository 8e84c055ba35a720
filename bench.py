"""Benchmark: batched small-QP throughput on one TPU chip.

Config: the BASELINE.json headline — batched random convex QPs (n=100,
m=150, box constraints, eps=1e-6), lock-step vmapped solve.  Prints one JSON
line: {"metric", "value", "unit", "vs_baseline"} where the baseline is the
north-star target of 10,000 QPs/s/chip (the reference publishes no numbers,
BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import os

    import jax

    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import qpdo_tpu as qt
    from qpdo_tpu.parallel.batch import _solve_batch_compact

    B = int(os.environ.get("QPDO_BENCH_B", 256))
    n, m = 100, 150

    rng = np.random.default_rng(0)
    M = rng.standard_normal((B, n, n))
    Q = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    problems = qt.Problem(
        Q=jnp.asarray(Q), q=jnp.asarray(rng.standard_normal((B, n))),
        A=jnp.asarray(rng.standard_normal((B, m, n))),
        l=jnp.asarray(-rng.random((B, m))),
        u=jnp.asarray(rng.random((B, m))),
        c=jnp.zeros((B,)))

    # two-phase precision: full float32 solve to 1e-3, then float64-state
    # polish (float32 KKT) to 1e-6; matmuls at HIGHEST precision
    settings = qt.Settings(eps_abs=1e-6, max_iter=300, inner_max_iter=50,
                           eps_abs_in=0.1, rho=0.02, delta=0.1,
                           refine_steps=2, kkt_dtype="float32",
                           hybrid_warmup=True, mu_min=1e-7)

    def run_sync():
        # straggler compaction: bitwise-identical per-problem results,
        # the unsolved tail finishes in a B/4 sub-batch
        res = _solve_batch_compact(problems, settings, None, None,
                                   False, False)
        # force full execution via host transfer (block_until_ready is
        # unreliable on the experimental axon platform)
        np.asarray(res.info.status_val)
        return res

    res = run_sync()  # compile + warmup
    solved = float(jnp.mean((res.info.status_val == qt.SOLVED).astype(jnp.float64)))

    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        res = run_sync()
    dt = (time.perf_counter() - t0) / reps

    qps = B / dt
    baseline = 10_000.0  # north-star QPs/s/chip (BASELINE.json)
    print(json.dumps({
        "metric": "batched_qp_throughput_n100_m150_eps1e-6",
        "value": round(qps, 2),
        "unit": "QPs/s/chip",
        "vs_baseline": round(qps / baseline, 6),
        "solved_fraction": round(solved, 4),
        "batch": B,
        "mean_iters": round(float(jnp.mean(res.info.iterations)), 2),
    }))


if __name__ == "__main__":
    main()
