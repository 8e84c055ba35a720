"""MXU tile-shape probe: what does the chip sustain at CANDIDATE solve
shapes vs the current bench shape (n=100, m=150)?

Round-4 verdict: the chip sustains 22.1 TFLOPS f32 on chained 4096^2
GEMMs but only 0.441 TFLOPS on the chained bench-shaped batched
formation GEMM — a 50x shape penalty that nothing had attempted to
change.  This probe measures, per candidate (B, m, n):

  - chained batched formation GEMM  K = A^T A   (einsum bmn,bmk->bnk),
    the solver's dominant op (2*B*m*n^2 FLOPs/rep);
  - chained batched Cholesky + two triangular solves at (B, n)
    (B*(n^3/3 + 2n^2) FLOPs/rep), the factorization path;
  - a chained "iteration proxy" fusing formation + Cholesky + solve,
    approximating one Newton iteration's MXU work.

MXU/VREG alignment on TPU f32 is (8, 128) (sublane, lane): m wants a
multiple of 8, n a multiple of 128.  Candidates cover the aligned
targets reachable by inert padding (qpdo_tpu/utils/padding.py) from the
bench shape, plus batch-size variations.

Prints one JSON line per (probe, shape).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import acquire_chip_lock, _wait_for_backend

R = 16          # chained reps per timed launch (amortizes dispatch floor)
REPS = 3        # best-of timed launches


def _sync(r):
    import jax.numpy as jnp
    np.asarray(jnp.ravel(r)[:1])


def _time_best(f, args, flops):
    _sync(f(*args))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return flops / best / 1e12, best


def probe_formation(B, m, n):
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(np.random.default_rng(0).standard_normal((B, m, n)),
                    jnp.float32)

    def chain(av):
        def body(_, av):
            with jax.default_matmul_precision("highest"):
                K = jnp.einsum("bmn,bmk->bnk", av, av)
            return av * (1.0 + 1e-30 * K[:, :1, :1])

        return jax.lax.fori_loop(0, R, body, av)

    return _time_best(jax.jit(chain), (a,), 2.0 * R * B * m * n * n)


def probe_cholesky(B, n):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    M = rng.standard_normal((B, n, n))
    K = jnp.asarray(np.einsum("bij,bkj->bik", M, M) / n + np.eye(n),
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)

    def chain(K, b):
        def body(_, bv):
            L = jnp.linalg.cholesky(K)
            z = jax.scipy.linalg.solve_triangular(
                L, bv[..., None], lower=True)
            x = jax.scipy.linalg.solve_triangular(
                L, z, lower=True, trans=1)[..., 0]
            return bv * (1.0 + 1e-30 * x[:, :1])

        return jax.lax.fori_loop(0, R, body, b)

    flops = R * B * (n ** 3 / 3.0 + 2.0 * n * n)
    return _time_best(jax.jit(chain), (K, b), flops)


def probe_iteration(B, m, n):
    """Formation + Cholesky + solve + the 4 certificate/rhs GEMVs —
    approximately one Newton iteration's MXU work, chained."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.standard_normal((B, m, n)), jnp.float32)
    Q = jnp.asarray(np.eye(n) * 1.0 + 0 * rng.standard_normal((n, n)),
                    jnp.float32)
    w = jnp.asarray(rng.random((B, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)

    def chain(A, w, b):
        def body(_, bv):
            with jax.default_matmul_precision("highest"):
                Aw = A * w[..., None]
                K = jnp.einsum("bmn,bmk->bnk", Aw, A) + Q
                L = jnp.linalg.cholesky(K)
                z = jax.scipy.linalg.solve_triangular(
                    L, bv[..., None], lower=True)
                x = jax.scipy.linalg.solve_triangular(
                    L, z, lower=True, trans=1)[..., 0]
                Adx = jnp.einsum("bmn,bn->bm", A, x)
                Aty = jnp.einsum("bmn,bm->bn", A, Adx * w)
            return bv * (1.0 + 1e-30 * Aty[:, :1])

        return jax.lax.fori_loop(0, R, body, b)

    flops = R * B * (2.0 * m * n * n + n ** 3 / 3.0 + 2.0 * n * n
                     + 4.0 * m * n)
    return _time_best(jax.jit(chain), (A, w, b), flops)


def main():
    _lock = acquire_chip_lock()
    if not _wait_for_backend():
        print(json.dumps({"error": "backend never came up"}))
        return

    shapes = [
        # (B, m, n): bench baseline, aligned paddings, batch scaling
        (256, 150, 100),
        (256, 152, 104),
        (256, 152, 128),
        (256, 160, 128),
        (256, 256, 128),
        (256, 150, 128),
        (1024, 150, 100),
        (1024, 152, 128),
        (64, 150, 100),
    ]
    for B, m, n in shapes:
        tf, t = probe_formation(B, m, n)
        print(json.dumps({"probe": "formation", "B": B, "m": m, "n": n,
                          "tflops": round(tf, 4), "t_chain_s": round(t, 5)}),
              flush=True)
    for B, n in [(256, 100), (256, 104), (256, 128), (1024, 100),
                 (1024, 128)]:
        tf, t = probe_cholesky(B, n)
        print(json.dumps({"probe": "cholesky", "B": B, "n": n,
                          "tflops": round(tf, 4), "t_chain_s": round(t, 5)}),
              flush=True)
    for B, m, n in [(256, 150, 100), (256, 152, 128), (256, 256, 128),
                    (1024, 152, 128)]:
        tf, t = probe_iteration(B, m, n)
        # per-iteration wall estimate: t/R is the chained per-rep cost
        print(json.dumps({"probe": "iteration", "B": B, "m": m, "n": n,
                          "tflops": round(tf, 4),
                          "t_per_iter_ms": round(t / R * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
