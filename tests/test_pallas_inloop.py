"""In-loop integration of the Pallas kernels (Settings.pallas_formation /
pallas_residuals) — SURVEY §7 step 4's "swap under the same signatures"
clause, wired behind flags in round 4.

On CPU the kernels run in interpret mode (pure jnp semantics), so these
tests pin exact algorithmic equivalence: same statuses, same iteration
counts, solutions equal to refinement-level noise.  The TPU wins/losses
are measured separately (scripts/tpu_queue*, BENCH A/B rows).
"""
import numpy as np
import pytest

import qpdo_tpu as qt
from qpdo_tpu.parallel import solve_batch

from utils import kkt_residuals, random_qp


def _problem(seed=0, n=40, m=60):
    Q, q, A, l, u = random_qp(n, m, seed=seed)
    return qt.make_problem(Q, q, A, l, u)


@pytest.mark.parametrize("flags", [
    dict(pallas_formation=True),
    dict(pallas_residuals=True),
    dict(pallas_formation=True, pallas_residuals=True),
])
def test_inloop_pallas_matches_baseline_single(flags):
    prob = _problem()
    r0 = qt.solve(prob)
    r1 = qt.solve(prob, settings=qt.Settings(**flags))
    assert int(r1.info.status_val) == int(r0.info.status_val) == qt.SOLVED
    assert int(r1.info.iterations) == int(r0.info.iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x),
                               atol=1e-9)


def test_inloop_pallas_batched_oracle():
    """vmap over the Pallas path (the bench execution shape): statuses
    and iterations identical to the jnp path, oracle-verified."""
    rng = np.random.default_rng(3)
    B, n, m = 4, 30, 45
    M = rng.standard_normal((B, n, n))
    Q = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    prob = qt.Problem(Q=Q, q=rng.standard_normal((B, n)),
                      A=rng.standard_normal((B, m, n)),
                      l=-np.ones((B, m)), u=np.ones((B, m)),
                      c=np.zeros(B))
    s = qt.Settings(pallas_formation=True, pallas_residuals=True)
    r0 = solve_batch(prob)
    r1 = solve_batch(prob, settings=s)
    np.testing.assert_array_equal(np.asarray(r1.info.status_val),
                                  np.asarray(r0.info.status_val))
    np.testing.assert_array_equal(np.asarray(r1.info.iterations),
                                  np.asarray(r0.info.iterations))
    for b in range(B):
        rp, rd = kkt_residuals(Q[b], prob.q[b], prob.A[b], prob.l[b],
                               prob.u[b], np.asarray(r1.x)[b],
                               np.asarray(r1.y)[b])
        assert max(rp, rd) < 1.1e-6


def test_inloop_pallas_bench_config():
    """The bench configuration (hybrid float32 warmup + polish + mixed
    GEMMs) with both kernels on: the f32 warmup phase is where the
    kernels engage on TPU, so the composition must hold end-to-end."""
    rng = np.random.default_rng(7)
    B, n, m = 3, 40, 60
    M = rng.standard_normal((B, n, n))
    Q = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    prob = qt.Problem(Q=Q, q=rng.standard_normal((B, n)),
                      A=rng.standard_normal((B, m, n)),
                      l=-rng.random((B, m)), u=rng.random((B, m)),
                      c=np.zeros(B))
    s = qt.Settings(eps_abs=1e-6, max_iter=300, inner_max_iter=50,
                    eps_abs_in=0.1, rho=0.02, delta=0.1,
                    refine_steps=2, kkt_dtype="float32",
                    hybrid_warmup=True, mu_min=1e-7,
                    cert_dtype="float32", linesearch="bisect",
                    linesearch_dtype="float32",
                    phase2_gemm_dtype="float32", hard_rows=8,
                    polish=True, warmup_eps=1e-3,
                    pallas_formation=True, pallas_residuals=True)
    res = solve_batch(prob, settings=s)
    assert np.all(np.asarray(res.info.status_val) == qt.SOLVED)
    for b in range(B):
        rp, rd = kkt_residuals(Q[b], prob.q[b], prob.A[b], prob.l[b],
                               prob.u[b], np.asarray(res.x)[b],
                               np.asarray(res.y)[b])
        assert max(rp, rd) < 1.1e-6


def test_vmap_collapses_into_kernel_batch_axis():
    """The round-4 Mosaic fix: vmapping the Pallas kernels must COLLAPSE
    the mapped axis into the kernel's leading batch axis (one pallas_call
    over V*B) rather than engage pallas_call's generic batching rule,
    which appends a grid dimension this toolchain fails to legalize
    ("func.return (i32, i64, i64)", logs/bench_r4_pallas_*.log).  Pin it
    structurally: the jaxpr of the vmapped call must contain a
    pallas_call whose first operand rank equals the unvmapped rank (the
    batching rule would leave rank+1), plus a value check vs reference."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qpdo_tpu.ops.pallas_formation import (fused_formation,
                                               reference_formation)

    rng = np.random.default_rng(3)
    V, B, m, n = 4, 2, 13, 9
    A = jnp.asarray(rng.standard_normal((V, B, m, n)), jnp.float32)
    w = jnp.asarray(rng.random((V, B, m)), jnp.float32)
    Q = jnp.asarray(rng.standard_normal((V, B, n, n)), jnp.float32)
    sig = jnp.asarray(rng.random((V, B)), jnp.float32)

    f = jax.vmap(lambda a, ww, q, s: fused_formation(a, ww, q, s,
                                                     interpret=True))
    jaxpr = jax.make_jaxpr(f)(A, w, Q, sig)
    calls = [e for e in str(jaxpr).split() if "pallas_call" in e]
    assert calls, "pallas_call not in the vmapped jaxpr"
    # the collapsed operand is (V*B, mp, np): rank 3, leading dim V*B
    text = str(jaxpr)
    assert f"{V * B}," in text  # the collapsed batch extent appears
    K = f(A, w, Q, sig)
    K_ref = jax.vmap(reference_formation)(A, w, Q, sig)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                               rtol=1e-5, atol=1e-5)


def test_inloop_pallas_kkt_solves_and_verifies():
    """Settings.pallas_kkt: the whole Newton solve as ONE kernel
    (formation + Jacobi scaling + Cholesky + substitutions, f32
    internally).  Unlike the formation/residuals kernels it is NOT
    bit-identical to the XLA path (different factorization algorithm),
    so pin the solution class, not the trajectory: statuses match, the
    iteration count stays in class vs the f32-KKT baseline, and every
    solve oracle-verifies — single and vmapped."""
    import jax
    import jax.numpy as jnp

    for seed in range(4):
        prob = _problem(seed=seed)
        Q, q, A, l, u = (np.asarray(a) for a in
                         (prob.Q, prob.q, prob.A, prob.l, prob.u))
        base = qt.Settings(kkt_dtype="float32", mu_min=1e-7,
                           refine_steps=2)
        r0 = qt.solve(prob, settings=base)
        r1 = qt.solve(prob, settings=base.replace(pallas_kkt=True))
        assert int(r1.info.status_val) == int(r0.info.status_val) \
            == qt.SOLVED
        assert abs(int(r1.info.iterations) - int(r0.info.iterations)) <= 5
        rp, rd = kkt_residuals(Q, q, A, l, u, r1.x, r1.y)
        assert max(rp, rd) <= 1e-6

    # vmapped (the bench execution shape)
    probs = [_problem(seed=10 + s) for s in range(3)]
    batch = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *probs)
    rb = solve_batch(batch, settings=qt.Settings(
        kkt_dtype="float32", mu_min=1e-7, refine_steps=2,
        pallas_kkt=True))
    assert np.all(np.asarray(rb.info.status_val) == qt.SOLVED)
    for i, p in enumerate(probs):
        rp, rd = kkt_residuals(np.asarray(p.Q), np.asarray(p.q),
                               np.asarray(p.A), np.asarray(p.l),
                               np.asarray(p.u), rb.x[i], rb.y[i])
        assert max(rp, rd) <= 1e-6


def _walk_jaxprs(jaxpr, found):
    """Collect every pallas_call eqn in a jaxpr tree."""
    import jax.extend as jex  # noqa: F401
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            found.append(eqn)
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", None)
            if inner is not None and hasattr(inner, "eqns"):
                _walk_jaxprs(inner, found)
            elif hasattr(v, "eqns"):
                _walk_jaxprs(v, found)
            elif isinstance(v, (tuple, list)):
                for vv in v:
                    inner = getattr(vv, "jaxpr", None)
                    if inner is not None and hasattr(inner, "eqns"):
                        _walk_jaxprs(inner, found)


def _assert_no_64bit(jaxpr, where):
    """No 64-bit aval anywhere inside a kernel jaxpr (Mosaic cannot lower
    i64/f64; under jax_enable_x64 a stray Python-int literal becomes one —
    the round-4 'func.return (i32, i64, i64)' / RecursionError class,
    logs/bench_r4h_pallas_*.log)."""
    import numpy as np

    def check(aval, ctx):
        dt = getattr(aval, "dtype", None)
        if dt is not None:
            assert np.dtype(dt).itemsize <= 4, (
                f"64-bit {dt} leaked into {where} ({ctx})")

    def rec(jx):
        for v in list(jx.invars) + list(jx.outvars) + list(jx.constvars):
            check(v.aval, "args")
        for eqn in jx.eqns:
            for v in eqn.invars:
                check(v.aval, str(eqn.primitive))
            for v in eqn.outvars:
                check(v.aval, str(eqn.primitive))
            for p in eqn.params.values():
                inner = getattr(p, "jaxpr", None)
                if inner is not None and hasattr(inner, "eqns"):
                    rec(inner)
                elif hasattr(p, "eqns"):
                    rec(p)

    rec(jaxpr)


@pytest.mark.parametrize("which", ["formation", "residuals", "kkt"])
def test_pallas_kernels_are_64bit_clean_under_x64(which):
    """Trace each in-loop kernel wrapper with jax_enable_x64 active (the
    bench's configuration — f64 solver state) and walk the pallas_call
    kernel jaxpr + BlockSpec index maps: no i64/f64 may appear.  This is
    the CPU-checkable pin for the Mosaic legalization failures that
    killed the round-4 on-TPU A/B cells."""
    import jax
    import jax.numpy as jnp

    B, n, m = 2, 8, 12
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s), f32)

    if which == "formation":
        from qpdo_tpu.ops.pallas_formation import fused_formation
        fn = lambda: jax.make_jaxpr(
            lambda a, w, q, s: fused_formation(a, w, q, s))(
                r(B, m, n), jnp.abs(r(B, m)), r(B, n, n), jnp.abs(r(B)))
    elif which == "residuals":
        from qpdo_tpu.ops.pallas_residuals import fused_residuals
        duals = [r(B, m) for _ in range(8)]
        prims = [r(B, n) for _ in range(6)]
        fn = lambda: jax.make_jaxpr(
            lambda *a: fused_residuals(*a))(
                *duals, *prims, jnp.abs(r(B)), jnp.abs(r(B)))
    else:
        from qpdo_tpu.ops.pallas_kkt import fused_kkt_solve
        fn = lambda: jax.make_jaxpr(
            lambda q, a, w, s, rh: fused_kkt_solve(q, a, w, s, rh))(
                r(B, n, n), r(B, m, n), jnp.abs(r(B, m)), jnp.abs(r(B)),
                r(B, n))

    jaxpr = fn().jaxpr
    calls = []
    _walk_jaxprs(jaxpr, calls)
    assert calls, "no pallas_call found in the traced program"
    for eqn in calls:
        kj = eqn.params["jaxpr"]
        _assert_no_64bit(getattr(kj, "jaxpr", kj), f"{which} kernel")
        gm = eqn.params.get("grid_mapping")
        if gm is not None:
            for bm in gm.block_mappings:
                imj = getattr(bm, "index_map_jaxpr", None)
                if imj is not None:
                    _assert_no_64bit(getattr(imj, "jaxpr", imj),
                                     f"{which} index map")
