"""Newton-solve replacement probe: the round-5 shape probe showed the
batched formation GEMM scales to 2.9 TFLOPS (B=1024, aligned) while the
batched Cholesky+trisolve path crawls at 0.02 TFLOPS and dominates the
bench iteration (~5 of 5.3 ms).  This probe isolates the factorization
cost and measures the TPU-native replacement candidates:

  - cholesky-only and trisolve-only (who exactly is slow?);
  - Newton-Schulz inverse steps X(2I - KX): pure batched GEMMs, f32 and
    bf16-with-f32-accumulation variants (warm-startable across Newton
    iterations since K changes slowly);
  - blocked Gauss-Jordan (sweep) SPD inversion: GEMM-rich O(n^3),
    nb sequential steps of rank-b updates;
  - batched K@v matvec (the per-CG-iteration cost of a factorization-
    free Newton solve) and a 30-iteration synthetic CG loop;
  - the candidate full iteration: formation + 2 NS steps + apply.

Prints one JSON line per measurement.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import acquire_chip_lock, _wait_for_backend

R = 16
REPS = 3


def _sync(r):
    import jax.numpy as jnp
    np.asarray(jnp.ravel(r)[:1])


def _time_best(f, args, flops):
    _sync(f(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return flops / best / 1e12, best


def _spd(B, n, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((B, n, n))
    return jnp.asarray(np.einsum("bij,bkj->bik", M, M) / n + np.eye(n),
                       jnp.float32)


def probe_chol_only(B, n):
    import jax
    import jax.numpy as jnp
    K = _spd(B, n)

    def chain(K):
        def body(_, c):
            L = jnp.linalg.cholesky(K + c * 1e-30)
            return c * (1.0 + 1e-30 * L[0, 0, 0])
        return jax.lax.fori_loop(0, R, body, jnp.float32(1.0))

    return _time_best(jax.jit(chain), (K,), R * B * n ** 3 / 3.0)


def probe_trisolve_only(B, n):
    import jax
    import jax.numpy as jnp
    K = _spd(B, n)
    L = jnp.linalg.cholesky(K)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((B, n)),
                    jnp.float32)

    def chain(L, b):
        def body(_, bv):
            z = jax.scipy.linalg.solve_triangular(L, bv[..., None],
                                                  lower=True)
            x = jax.scipy.linalg.solve_triangular(L, z, lower=True,
                                                  trans=1)[..., 0]
            return bv * (1.0 + 1e-30 * x[:, :1])
        return jax.lax.fori_loop(0, R, body, b)

    return _time_best(jax.jit(chain), (L, b), R * B * 2.0 * n * n)


def probe_ns_step(B, n, dtype):
    """One Newton-Schulz step X(2I - KX): 2 batched GEMMs."""
    import jax
    import jax.numpy as jnp
    K = _spd(B, n)
    X = jnp.eye(n, dtype=jnp.float32)[None].repeat(B, 0) * 0.01

    if dtype == "bf16":
        def step(K, X):
            Kb, Xb = K.astype(jnp.bfloat16), X.astype(jnp.bfloat16)
            KX = jax.lax.dot_general(
                Kb, Xb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            Y = 2.0 * jnp.eye(n, dtype=jnp.float32) - KX
            return jax.lax.dot_general(
                Xb, Y.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
    else:
        def step(K, X):
            with jax.default_matmul_precision("highest"):
                KX = jnp.einsum("bij,bjk->bik", K, X)
                Y = 2.0 * jnp.eye(n, dtype=jnp.float32) - KX
                return jnp.einsum("bij,bjk->bik", X, Y)

    def chain(K, X):
        def body(_, Xv):
            Xn = step(K, Xv)
            return Xv * (1.0 + 1e-30 * Xn[:, :1, :1])
        return jax.lax.fori_loop(0, R, body, X)

    return _time_best(jax.jit(chain), (K, X), R * B * 4.0 * n ** 3)


def probe_gj_inverse(B, n, b):
    """Blocked Gauss-Jordan (sweep) SPD inversion: nb steps, each a b x b
    pivot inverse + rank-b GEMM update of the whole matrix."""
    import jax
    import jax.numpy as jnp
    K = _spd(B, n)
    nb = n // b
    assert nb * b == n

    def sweep(K):
        def body(k, M):
            P = jax.lax.dynamic_slice(M, (0, k * b, k * b), (B, b, b))
            Pinv = jnp.linalg.inv(P)
            C = jax.lax.dynamic_slice(M, (0, 0, k * b), (B, n, b))
            Rw = jax.lax.dynamic_slice(M, (0, k * b, 0), (B, b, n))
            with jax.default_matmul_precision("highest"):
                CP = jnp.einsum("bij,bjk->bik", C, Pinv)
                M = M - jnp.einsum("bij,bjk->bik", CP, Rw)
            # restore pivot row/col in swept form
            M = jax.lax.dynamic_update_slice(M, CP, (0, 0, k * b))
            PR = jnp.einsum("bij,bjk->bik", Pinv, Rw)
            M = jax.lax.dynamic_update_slice(M, PR, (0, k * b, 0))
            M = jax.lax.dynamic_update_slice(M, -Pinv, (0, k * b, k * b))
            return M
        return jax.lax.fori_loop(0, nb, body, K)

    def chain(K):
        def body(_, c):
            S = sweep(K * c)
            return c * (1.0 + 1e-30 * S[0, 0, 0])
        return jax.lax.fori_loop(0, R, body, jnp.float32(1.0))

    # ~2n^3 multiply-adds total (rank-b update of n^2 entries, nb times)
    tf, t = _time_best(jax.jit(chain), (K,), R * B * 2.0 * n ** 3)
    # accuracy: -sweep(K) must be K^{-1}
    S = -np.asarray(jax.jit(sweep)(K))
    I = np.einsum("bij,bjk->bik", np.asarray(K, np.float64), S)
    err = float(np.abs(I - np.eye(n)).max())
    return tf, t, err


def probe_matvec(B, n):
    import jax
    import jax.numpy as jnp
    K = _spd(B, n)
    v = jnp.asarray(np.random.default_rng(2).standard_normal((B, n)),
                    jnp.float32)

    def chain(K, v):
        def body(_, vv):
            w = jnp.einsum("bij,bj->bi", K, vv)
            return vv * (1.0 + 1e-30 * w[:, :1])
        return jax.lax.fori_loop(0, R, body, v)

    return _time_best(jax.jit(chain), (K, v), R * B * 2.0 * n * n)


def probe_cg_loop(B, n, iters=30):
    """Synthetic Jacobi-preconditioned CG: the factorization-free Newton
    solve candidate.  Times `iters` full CG iterations (matvec + dots +
    axpys) at the bench shape."""
    import jax
    import jax.numpy as jnp
    K = _spd(B, n)
    rhs = jnp.asarray(np.random.default_rng(3).standard_normal((B, n)),
                      jnp.float32)
    dinv = 1.0 / jnp.diagonal(K, axis1=-2, axis2=-1)

    def cg(K, rhs):
        x = jnp.zeros_like(rhs)
        r = rhs
        z = r * dinv
        p = z
        rz = jnp.sum(r * z, -1)

        def body(_, carry):
            x, r, p, rz = carry
            Kp = jnp.einsum("bij,bj->bi", K, p)
            alpha = rz / jnp.sum(p * Kp, -1)
            x = x + alpha[:, None] * p
            r = r - alpha[:, None] * Kp
            z = r * dinv
            rz_new = jnp.sum(r * z, -1)
            p = z + (rz_new / rz)[:, None] * p
            return x, r, p, rz_new

        x, r, p, rz = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
        return x

    flops = B * iters * (2.0 * n * n + 10.0 * n)
    return _time_best(jax.jit(cg), (K, rhs), flops)


def probe_iteration_ns(B, m, n, ns_steps=2):
    """Candidate iteration: formation + ns_steps Newton-Schulz + apply."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    A = jnp.asarray(rng.standard_normal((B, m, n)), jnp.float32)
    w = jnp.asarray(rng.random((B, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    X0 = jnp.eye(n, dtype=jnp.float32)[None].repeat(B, 0)

    def chain(A, w, b, X):
        def body(_, carry):
            bv, Xv = carry
            with jax.default_matmul_precision("highest"):
                Aw = A * w[..., None]
                K = jnp.einsum("bmn,bmk->bnk", Aw, A) \
                    + jnp.eye(n, dtype=jnp.float32)
                for _ in range(ns_steps):
                    KX = jnp.einsum("bij,bjk->bik", K, Xv)
                    Xv = jnp.einsum(
                        "bij,bjk->bik", Xv,
                        2.0 * jnp.eye(n, dtype=jnp.float32) - KX)
                dx = jnp.einsum("bij,bj->bi", Xv, bv)
                Adx = jnp.einsum("bmn,bn->bm", A, dx)
                Aty = jnp.einsum("bmn,bm->bn", A, Adx * w)
            return bv * (1.0 + 1e-30 * Aty[:, :1]), Xv
        bv, Xv = jax.lax.fori_loop(0, R, body, (b, X))
        return bv

    flops = R * B * (2.0 * m * n * n + ns_steps * 4.0 * n ** 3
                     + 2.0 * n * n + 4.0 * m * n)
    return _time_best(jax.jit(chain), (A, w, b, X0), flops)


def main():
    _lock = acquire_chip_lock()
    if not _wait_for_backend():
        print(json.dumps({"error": "backend never came up"}))
        return

    def emit(probe, extra, res):
        if len(res) == 3:
            tf, t, err = res
        else:
            (tf, t), err = res, None
        rec = {"probe": probe, **extra, "tflops": round(tf, 4),
               "t_chain_s": round(t, 5),
               "t_per_rep_ms": round(t / R * 1e3, 3)}
        if err is not None:
            rec["inv_err"] = err
        print(json.dumps(rec), flush=True)

    for B, n in [(256, 100), (256, 128), (1024, 128)]:
        emit("chol_only", {"B": B, "n": n}, probe_chol_only(B, n))
        emit("trisolve_only", {"B": B, "n": n}, probe_trisolve_only(B, n))
    for B, n in [(256, 100), (256, 128), (1024, 128)]:
        emit("ns_step_f32", {"B": B, "n": n}, probe_ns_step(B, n, "f32"))
        emit("ns_step_bf16", {"B": B, "n": n}, probe_ns_step(B, n, "bf16"))
    for B, n, b in [(256, 96, 32), (256, 128, 32), (1024, 128, 32)]:
        emit("gj_inverse", {"B": B, "n": n, "b": b},
             probe_gj_inverse(B, n, b))
    for B, n in [(256, 100), (256, 128), (1024, 128)]:
        emit("matvec", {"B": B, "n": n}, probe_matvec(B, n))
        emit("cg30", {"B": B, "n": n}, probe_cg_loop(B, n))
    for B, m, n in [(256, 150, 100), (256, 152, 128), (1024, 152, 128)]:
        emit("iteration_ns2", {"B": B, "m": m, "n": n},
             probe_iteration_ns(B, m, n))


if __name__ == "__main__":
    main()
