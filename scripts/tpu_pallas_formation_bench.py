"""On-TPU microbenchmark: fused KKT-formation Pallas kernel vs the XLA
two-op baseline (row scale + batched GEMM), at the headline bench shape
and a larger one.  One JSON line per shape."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from qpdo_tpu.ops.pallas_formation import fused_formation, reference_formation


def best_of(f, args, reps=5):
    out = f(*args)
    np.asarray(out)[0, 0, 0]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out)[0, 0, 0]
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(5)
    ref = jax.jit(reference_formation)
    interp = jax.default_backend() == "cpu"
    for B, m, n in [(256, 150, 100), (64, 600, 400)]:
        A = jnp.asarray(rng.standard_normal((B, m, n)), jnp.float32)
        w = jnp.asarray(rng.random((B, m)), jnp.float32)
        M = rng.standard_normal((B, n, n)).astype(np.float32)
        Q = jnp.asarray(np.einsum("bij,bkj->bik", M, M) / n)
        sigma = jnp.asarray(rng.random(B) * 0.1, jnp.float32)
        args = (A, w, Q, sigma)
        t_ref = best_of(ref, args)
        t_pl = best_of(lambda *a: fused_formation(*a, interpret=interp),
                       args)
        ok = np.allclose(np.asarray(fused_formation(*args, interpret=interp)),
                         np.asarray(ref(*args)), rtol=1e-4, atol=1e-4)
        print(json.dumps({
            "bench": "fused_formation", "B": B, "m": m, "n": n,
            "xla_ms": round(t_ref * 1e3, 3),
            "pallas_ms": round(t_pl * 1e3, 3),
            "speedup": round(t_ref / t_pl, 3), "match": bool(ok),
            "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
