"""Per-op wall profile of the bench iteration's MXU dispatches (round-4
verdict item 6: "a committed per-op profile showing the floor is
XLA-irreducible", if the op-count cuts don't move the headline).

Times each MXU-dispatch class of the dense warmup iteration STANDALONE at
the exact bench shape (B=256, n=100, m=150, padded as the solver pads,
float32 @highest) and compares their sum against the measured whole-step
wall.  Each cell is jitted alone, synced via a 1-element host transfer,
best-of-reps.  One JSON line per op + a summary line.

Op list (the ~13-op enumeration of RESULTS.md round 3, after the round-4
cuts):
  formation    A'(w.A) + Q + sigma I          (n+1 cols in fused-rhs mode)
  cholesky     lax.linalg.cholesky(K)
  trisolve     two triangular solves (cho_solve)
  qmv2         Q @ [dx | dx_c]                (stacked pair, round 4)
  amv2         A @ [dx | dx_c]
  atmv2        A' @ [dy | dy_c]
  at_ytilde    A' ytilde                      (absorbed by fused-rhs mode)
  residuals    the fused residual+norm elementwise block
  linesearch   bisect_chunk merit chain
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

plat = os.environ.get("QPDO_PROBE_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)

import numpy as np  # noqa: E402


def sync(r):
    leaves = jax.tree_util.tree_leaves(r)
    np.asarray(jnp.ravel(leaves[0])[:1])


def best_of(f, args, reps=5):
    sync(f(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    B, n, m = 256, 100, 150
    rng = np.random.default_rng(0)
    dt = jnp.float32
    A = jnp.asarray(rng.standard_normal((B, m, n)), dt)
    Q = jnp.asarray(rng.standard_normal((B, n, n)), dt)
    Q = jnp.einsum("bij,bkj->bik", Q, Q) / n + 0.1 * jnp.eye(n, dtype=dt)
    w = jnp.asarray(rng.random((B, m)), dt)
    dx2 = jnp.asarray(rng.standard_normal((B, n, 2)), dt)
    dy2 = jnp.asarray(rng.standard_normal((B, m, 2)), dt)
    yt = jnp.asarray(rng.standard_normal((B, m)), dt)
    sig = jnp.asarray(rng.random((B,)), dt)

    with jax.default_matmul_precision("highest"):
        K0 = jnp.einsum("bmi,bmj->bij", A, w[..., None] * A) + Q \
            + sig[:, None, None] * jnp.eye(n, dtype=dt)[None]
    L0 = jnp.linalg.cholesky(K0)
    rhs = jnp.asarray(rng.standard_normal((B, n)), dt)

    P = jax.default_matmul_precision

    def formation(A, w, Q, sig):
        with P("highest"):
            return (jnp.einsum("bmi,bmj->bij", A, w[..., None] * A) + Q
                    + sig[:, None, None] * jnp.eye(n, dtype=dt)[None])

    def cholesky(K):
        return jnp.linalg.cholesky(K)

    def trisolve(L, r):
        z = jax.lax.linalg.triangular_solve(L, r[..., None], left_side=True,
                                            lower=True)
        return jax.lax.linalg.triangular_solve(
            L, z, left_side=True, lower=True, transpose_a=True)[..., 0]

    def qmv2(Q, X):
        with P("highest"):
            return jnp.einsum("bij,bjk->bik", Q, X)

    def amv2(A, X):
        with P("highest"):
            return jnp.einsum("bmn,bnk->bmk", A, X)

    def atmv2(A, Y):
        with P("highest"):
            return jnp.einsum("bmn,bmk->bnk", A, Y)

    def at_ytilde(A, y):
        with P("highest"):
            return jnp.einsum("bmn,bm->bn", A, y)

    cells = [
        ("formation", formation, (A, w, Q, sig)),
        ("cholesky", cholesky, (K0,)),
        ("trisolve", trisolve, (L0, rhs)),
        ("qmv2", qmv2, (Q, dx2)),
        ("amv2", amv2, (A, dx2)),
        ("atmv2", atmv2, (A, dy2)),
        ("at_ytilde", at_ytilde, (A, yt)),
    ]
    # chained variant: R dependent reps inside ONE jit program.  The
    # round-4 standalone rows all read 25-31 ms — the axon per-dispatch/
    # sync floor, not op cost (the whole in-loop iteration is ~7.6 ms for
    # ~15 ops).  Feeding one scalar of each output back into an input
    # makes the reps data-dependent (not CSE-able) while the 1e-30
    # perturbation rounds away, so chained_ms/rep is the true device cost.
    R = 32

    def chained(f, args, reps=3):
        def prog(*args):
            def body(_, a):
                outv = f(*a)
                a = list(a)
                a[0] = a[0] * (1.0 + 1e-30 * jnp.ravel(outv)[0])
                return tuple(a)

            return jax.lax.fori_loop(0, R, body, tuple(args))[0]

        return best_of(jax.jit(prog), args, reps) / R

    total = 0.0
    total_chained = 0.0
    out = {}
    for name, f, args in cells:
        t = best_of(jax.jit(f), args)
        tc = chained(f, args)
        total += t
        total_chained += tc
        out[name] = round(t * 1e3, 3)
        out[name + "_chained"] = round(tc * 1e3, 3)
        print(json.dumps({"op": name, "ms": round(t * 1e3, 3),
                          "chained_ms": round(tc * 1e3, 3),
                          "backend": jax.default_backend()}), flush=True)

    # whole bench step for comparison: iterations/s from the bench JSON
    # give step wall = B / (QPs/s * mean_iters); print sum for the floor
    print(json.dumps({"sum_standalone_ms": round(total * 1e3, 3),
                      "sum_chained_ms": round(total_chained * 1e3, 3),
                      "note": ("compare against bench step wall = "
                               "batch/(QPs_per_s*mean_iters); standalone "
                               "rows carry the ~25-30 ms axon dispatch "
                               "floor, chained rows amortize it away — "
                               "step_wall - sum_chained is the true "
                               "in-loop overhead budget"),
                      **out}), flush=True)


if __name__ == "__main__":
    main()
