"""Batched MPC-style scenario solving — the TPU-native workflow.

No reference equivalent (the reference solves one QP per process): build a
batch of scenario QPs, solve them lock-step on one chip, then re-solve
warm-started after the problem drifts — the pattern behind the
"thousands of scenario QPs per chip" scaling story.

Run:  python examples/batched_mpc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import qpdo_tpu as qt
from qpdo_tpu.parallel import solve_batch


def make_batch(B, n, m, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    M = rng.standard_normal((B, n, n))
    Q = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    return qt.Problem(
        Q=jnp.asarray(Q), q=jnp.asarray(rng.standard_normal((B, n))),
        A=jnp.asarray(rng.standard_normal((B, m, n))),
        l=jnp.asarray(-rng.random((B, m))), u=jnp.asarray(rng.random((B, m))),
        c=jnp.zeros((B,)))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    B, n, m = 64, 50, 75
    problems = make_batch(B, n, m)
    settings = qt.Settings(eps_abs=1e-6, inner_max_iter=50, refine_steps=2,
                           kkt_dtype="float32", hybrid_warmup=True,
                           mu_min=1e-7)

    t0 = time.perf_counter()
    cold = solve_batch(problems, settings)
    solved = np.asarray(cold.info.status_val) == qt.SOLVED
    print(f"cold: {solved.mean():.0%} solved, "
          f"mean {float(np.asarray(cold.info.iterations).mean()):.1f} iters, "
          f"{time.perf_counter() - t0:.2f}s (includes compile)")

    # the world drifts; re-solve warm
    rng = np.random.default_rng(1)
    problems2 = problems._replace(
        q=problems.q + 1e-3 * jnp.asarray(rng.standard_normal((B, n))))
    t0 = time.perf_counter()
    warm = solve_batch(problems2, settings, x0=cold.x, y0=cold.y)
    solved = np.asarray(warm.info.status_val) == qt.SOLVED
    print(f"warm: {solved.mean():.0%} solved, "
          f"mean {float(np.asarray(warm.info.iterations).mean()):.1f} iters, "
          f"{time.perf_counter() - t0:.2f}s")

    # warm + polish: when the drift leaves the active sets unchanged, one
    # verified saddle solve replaces the whole iteration (0 iters/problem).
    # hybrid_warmup off: the zero-iteration pre-loop polish lives on the
    # direct path, and a near-optimal warm start has no use for the f32
    # warmup phase anyway.
    sp = settings.replace(polish=True, hybrid_warmup=False)
    t0 = time.perf_counter()
    pol = solve_batch(problems2, sp, x0=cold.x, y0=cold.y)
    solved = np.asarray(pol.info.status_val) == qt.SOLVED
    print(f"warm+polish: {solved.mean():.0%} solved, "
          f"mean {float(np.asarray(pol.info.iterations).mean()):.1f} iters, "
          f"{time.perf_counter() - t0:.2f}s (includes compile)")


if __name__ == "__main__":
    main()
