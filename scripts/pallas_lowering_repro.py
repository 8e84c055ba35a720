"""Compile-only repro matrix for the Mosaic "func.return (i32, i64, i64)"
legalization failure that kills every in-loop Pallas bench cell (round 4).

Each cell lowers+compiles one composition (no execution) and prints one
JSON line {cell, ok, err}.  Known facts going in: the standalone batched
kernels compiled AND ran on this platform in round 3; the in-loop cells
fail even with the custom_vmap batch-collapse rule, so the batching rule
is NOT (or not the only) trigger.  Hypotheses separated here:

  A. toolchain regression — the plain standalone kernel no longer lowers
  B. while_loop — pallas_call inside a lax.while_loop body
  C. vmap+collapse — the custom_vmap rule's output
  D. raw vmap (no collapse) — the known-bad control from queue r4a
  E. the fused KKT kernel standalone (fori_loop inside the kernel)
  F. the fused residuals kernel standalone
"""
import json
import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from qpdo_tpu.ops.pallas_formation import fused_formation, _impl
from qpdo_tpu.ops.pallas_kkt import fused_kkt_solve
from qpdo_tpu.ops.pallas_residuals import fused_residuals


def try_compile(name, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(json.dumps({"cell": name, "ok": True}), flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        key = "func.return" if "func.return" in msg else msg[:120]
        print(json.dumps({"cell": name, "ok": False, "err": key}),
              flush=True)


def main():
    B, m, n = 8, 150, 100
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((B, m, n)), jnp.float32)
    w = jnp.asarray(rng.random((B, m)), jnp.float32)
    Q = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)
    sig = jnp.asarray(rng.random((B,)), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)

    # A: plain standalone batched formation (ran in round 3)
    try_compile("A_standalone", lambda a, ww, q, s:
                fused_formation(a, ww, q, s), A, w, Q, sig)

    # B: inside a while_loop body (the solve-loop composition, no vmap)
    def loop_fn(a, ww, q, s):
        def body(c):
            k, acc = c
            K = fused_formation(a, ww, q, s)
            return k + 1, acc + K[0, 0, 0]

        return jax.lax.while_loop(lambda c: c[0] < 3, body,
                                  (jnp.int32(0), jnp.float32(0.0)))[1]

    try_compile("B_while_loop", loop_fn, A, w, Q, sig)

    # C: vmap with the collapse rule (per-problem call under vmap)
    try_compile("C_vmap_collapse", jax.vmap(
        lambda a, ww, q, s: fused_formation(a[None], ww[None], q[None],
                                            s[None])[0]), A, w, Q, sig)

    # C2: vmap + while_loop (the full in-loop composition)
    def solve_like(a, ww, q, s):
        def body(c):
            k, acc = c
            K = fused_formation(a[None], ww[None], q[None], s[None])[0]
            return k + 1, acc + K[0, 0]

        return jax.lax.while_loop(lambda c: c[0] < 3, body,
                                  (jnp.int32(0), jnp.float32(0.0)))[1]

    try_compile("C2_vmap_while", jax.vmap(solve_like), A, w, Q, sig)

    # D: raw pallas under vmap WITHOUT collapse (known-bad control)
    def raw(a, ww, q, s):
        mp = -(-m // 8) * 8
        npad = -(-n // 128) * 128
        from jax.experimental import pallas as pl  # noqa: F401
        A_p = jnp.pad(a, ((0, 0), (0, mp - m), (0, npad - n)))
        w_p = jnp.pad(ww, ((0, 0), (0, mp - m)))[..., None]
        Q_p = jnp.pad(q, ((0, 0), (0, npad - n), (0, npad - n)))
        return _impl(A_p, w_p, Q_p, s.reshape(-1, 1, 1), False)

    try_compile("D_raw_vmap", jax.vmap(
        lambda a, ww, q, s: raw(a[None], ww[None], q[None],
                                s[None])[0]), A, w, Q, sig)

    # E: fused KKT kernel standalone
    try_compile("E_kkt_standalone", lambda q, a, ww, s, r:
                fused_kkt_solve(q, a, ww, s, r), Q, A, w, sig, rhs)

    # F: fused residuals standalone
    dual = [jnp.asarray(rng.standard_normal((B, m)), jnp.float32)
            for _ in range(8)]
    prim = [jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
            for _ in range(6)]
    try_compile("F_residuals_standalone", lambda *a:
                fused_residuals(*a), *dual, *prim, sig, sig)

    # ---- G cells: jax_enable_x64 ACTIVE (the bench's configuration) ----
    # Round-4 finding: cells A-F all passed while every in-loop bench cell
    # failed, because the repro never enabled x64.  Under x64, Python-int
    # literals (ref indices, fori_loop bounds, index-map constants)
    # canonicalize to i64 — the actual trigger of both Mosaic failures
    # ("func.return (i32, i64, i64)" and the _convert_helper recursion).
    # The kernels now trace inside pallas_util.x32_trace_scope; these
    # cells prove the fix compiles on the real toolchain.
    jax.config.update("jax_enable_x64", True)
    try_compile("G_formation_x64", lambda a, ww, q, s:
                fused_formation(a, ww, q, s), A, w, Q, sig)
    try_compile("G_kkt_x64", lambda q, a, ww, s, r:
                fused_kkt_solve(q, a, ww, s, r), Q, A, w, sig, rhs)
    try_compile("G_residuals_x64", lambda *a:
                fused_residuals(*a), *dual, *prim, sig, sig)

    def solve_like_x64(a, ww, q, s):
        def body(c):
            k, acc = c
            K = fused_formation(a[None], ww[None], q[None], s[None])[0]
            return k + 1, acc + K[0, 0]

        return jax.lax.while_loop(lambda c: c[0] < 3, body,
                                  (jnp.int32(0), jnp.float32(0.0)))[1]

    try_compile("G_vmap_while_x64", jax.vmap(solve_like_x64), A, w, Q, sig)


if __name__ == "__main__":
    main()
