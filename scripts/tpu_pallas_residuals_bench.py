"""On-TPU microbenchmark: fused residual+norm Pallas kernel vs the
identical XLA-compiled jnp block, at the headline bench shape
(B=256, n=100, m=150) and a larger shape.  Prints one JSON line per
shape; integration into step() is warranted only where pallas wins
(the round-2 Pallas-Cholesky protocol, RESULTS.md)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import numpy as np

from qpdo_tpu.ops.pallas_residuals import fused_residuals, reference_residuals

sys.path.insert(0, "/root/repo/tests")
from test_pallas_residuals import _inputs  # noqa: E402


def best_of(f, args, reps=5):
    out = f(*args)
    np.asarray(out[0])  # compile + sync (host transfer = the axon sync)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ref = jax.jit(reference_residuals)
    # compiled pallas is TPU-only; the CPU rehearsal uses interpret mode
    # (its timing is meaningless there — the run just proves the script)
    interp = jax.default_backend() == "cpu"
    for B, n, m in [(256, 100, 150), (256, 400, 600)]:
        args = _inputs(B, n, m, seed=1)
        t_ref = best_of(ref, args)
        t_pl = best_of(lambda *a: fused_residuals(*a, interpret=interp),
                       args)
        # correctness on-device too
        o1 = ref(*args)
        o2 = fused_residuals(*args, interpret=interp)
        ok = all(np.allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                             atol=1e-5) for a, b in zip(o2, o1))
        print(json.dumps({
            "bench": "fused_residuals", "B": B, "n": n, "m": m,
            "xla_ms": round(t_ref * 1e3, 3),
            "pallas_ms": round(t_pl * 1e3, 3),
            "speedup": round(t_ref / t_pl, 3),
            "match": bool(ok),
            "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
