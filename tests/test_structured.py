"""Block-angular structured solver: parity with the dense core + sharding."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import qpdo_tpu as qt
from qpdo_tpu.solver.structured import (BlockAngularProblem,
                                        solve_block_angular,
                                        to_dense_problem)


def _random_bap(S=4, ms=12, n0=6, ns=8, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    M0 = rng.standard_normal((n0, n0)) / np.sqrt(n0)
    Ms = rng.standard_normal((S, ns, ns)) / np.sqrt(ns)
    return BlockAngularProblem(
        Q0=jnp.asarray(M0 @ M0.T + 0.5 * np.eye(n0), dtype),
        Qs=jnp.asarray(np.einsum("sij,skj->sik", Ms, Ms) + 0.5 * np.eye(ns),
                       dtype),
        q0=jnp.asarray(rng.standard_normal(n0), dtype),
        qs=jnp.asarray(rng.standard_normal((S, ns)), dtype),
        T=jnp.asarray(rng.standard_normal((S, ms, n0)) * 0.5, dtype),
        W=jnp.asarray(rng.standard_normal((S, ms, ns)), dtype),
        l=jnp.asarray(-rng.random((S, ms)) - 0.1, dtype),
        u=jnp.asarray(rng.random((S, ms)) + 0.1, dtype),
        c=jnp.asarray(0.0, dtype))


SETTINGS = qt.Settings(scaling=0, eps_prim_inf=0.0, eps_dual_inf=0.0,
                       max_iter=500)


def test_matches_dense():
    """The structured step must replicate the dense core exactly: same
    iteration count, same solution."""
    p = _random_bap()
    x0, xs, y, info = solve_block_angular(p, SETTINGS)
    assert int(info.status_val) == qt.SOLVED

    dense = to_dense_problem(p)
    res = qt.solve(dense, SETTINGS)
    assert int(res.info.status_val) == qt.SOLVED
    assert int(info.iterations) == int(res.info.iterations)
    n0 = p.Q0.shape[0]
    np.testing.assert_allclose(np.asarray(x0), np.asarray(res.x[:n0]),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(xs).ravel(),
                               np.asarray(res.x[n0:]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(y).ravel(), np.asarray(res.y),
                               atol=1e-8)


def test_structured_kkt():
    p = _random_bap(S=6, ms=10, n0=5, ns=7, seed=3)
    x0, xs, y, info = solve_block_angular(p, SETTINGS)
    assert int(info.status_val) == qt.SOLVED
    # independent KKT check on the assembled dense problem
    dense = to_dense_problem(p)
    x = np.concatenate([np.asarray(x0), np.asarray(xs).ravel()])
    yv = np.asarray(y).ravel()
    A = np.asarray(dense.A)
    Ax = A @ x
    rp = np.max(np.abs(Ax - np.clip(Ax + yv, np.asarray(dense.l),
                                    np.asarray(dense.u))))
    rd = np.max(np.abs(np.asarray(dense.Q) @ x + np.asarray(dense.q)
                       + A.T @ yv))
    assert rp <= 1e-6 and rd <= 1e-6


def test_sharded_scenarios_match():
    """Scenario axis sharded over an 8-device mesh: XLA inserts the Schur
    reduction collectives; results match the unsharded run."""
    p = _random_bap(S=8, ms=10, n0=5, ns=6, seed=4)
    x0_ref, xs_ref, y_ref, info_ref = solve_block_angular(p, SETTINGS)

    mesh = Mesh(np.array(jax.devices()[:8]), ("sc",))

    def shard(a):
        if a.ndim >= 1 and a.shape[0] == 8:
            return jax.device_put(a, NamedSharding(
                mesh, P("sc", *([None] * (a.ndim - 1)))))
        return jax.device_put(a, NamedSharding(mesh, P()))

    p_sharded = BlockAngularProblem(*[shard(a) for a in p])
    x0, xs, y, info = jax.jit(
        lambda pp: solve_block_angular(pp, SETTINGS))(p_sharded)
    assert int(info.status_val) == qt.SOLVED
    assert int(info.iterations) == int(info_ref.iterations)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x0_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), atol=1e-9)


def test_warm_start_structured():
    p = _random_bap(seed=5)
    x0, xs, y, info = solve_block_angular(p, SETTINGS)
    cold_iters = int(info.iterations)
    x0b, xsb, yb, info2 = solve_block_angular(p, SETTINGS, warm=(x0, xs, y))
    assert int(info2.status_val) == qt.SOLVED
    assert int(info2.iterations) <= cold_iters


def test_vmapped_structured_batch():
    """A batch of block-angular instances via vmap (scenario MPC fleets)."""
    import jax

    probs = [_random_bap(seed=s) for s in (10, 11, 12)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    solve = jax.vmap(lambda p: solve_block_angular(p, SETTINGS))
    x0, xs, y, info = solve(batch)
    assert x0.shape[0] == 3
    for k in range(3):
        assert int(info.status_val[k]) == qt.SOLVED
        ref = solve_block_angular(probs[k], SETTINGS)
        np.testing.assert_allclose(np.asarray(x0[k]), np.asarray(ref[0]),
                                   atol=1e-9)


def test_scaled_block_angular():
    """v2: Ruiz scaling on the block-angular path (scaling.c:36-88 applied
    to the block form) — badly scaled scenario data solves to 1e-6."""
    p = _random_bap(seed=21)
    # scale rows/cols badly: T,W rows by 1e3, one xs block by 1e-3
    p = p._replace(T=p.T * 1e3, W=p.W * 1e3, l=p.l * 1e3, u=p.u * 1e3)
    s_scaled = qt.Settings(scaling=10, eps_prim_inf=0.0, eps_dual_inf=0.0,
                           max_iter=500)
    x0, xs, y, info = solve_block_angular(p, s_scaled)
    assert int(info.status_val) == qt.SOLVED
    dense = to_dense_problem(p)
    x = np.concatenate([np.asarray(x0), np.asarray(xs).ravel()])
    yv = np.asarray(y).ravel()
    A = np.asarray(dense.A)
    Ax = A @ x
    rp = np.max(np.abs(Ax - np.clip(Ax + yv, np.asarray(dense.l),
                                    np.asarray(dense.u))))
    rd = np.max(np.abs(np.asarray(dense.Q) @ x + np.asarray(dense.q)
                       + A.T @ yv))
    assert rp <= 1e-6 and rd <= 1e-6


def test_scaling_matches_dense_scaled():
    """Block Ruiz == dense Ruiz on the assembled problem (same D/E/c up to
    block ordering)."""
    from qpdo_tpu.solver.structured import scale_block_angular
    from qpdo_tpu.solver.scaling import scale_problem

    p = _random_bap(S=3, ms=7, n0=4, ns=5, seed=30)
    op = scale_block_angular(p, 10)
    spd = scale_problem(to_dense_problem(p), 10)
    n0 = 4
    D0, Ds = op.D
    np.testing.assert_allclose(np.asarray(D0),
                               np.asarray(spd.scaling.D[:n0]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Ds).ravel(),
                               np.asarray(spd.scaling.D[n0:]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(op.E).ravel(),
                               np.asarray(spd.scaling.E), rtol=1e-12)
    np.testing.assert_allclose(float(op.cost), float(spd.scaling.c),
                               rtol=1e-12)


def test_structured_primal_infeasible():
    """v2: infeasibility certificates on the block-angular path
    (termination.c:97-151).  Scenario rows demand T x0 + W xs both <= 0
    and >= 1 for identical (T, W) — primal infeasible."""
    from qpdo_tpu.solver.structured import solve_block_angular_result

    S, ms, n0, ns = 2, 4, 3, 3
    rng = np.random.default_rng(0)
    T1 = rng.standard_normal((ms // 2, n0))
    W1 = rng.standard_normal((ms // 2, ns))
    T = jnp.asarray(np.broadcast_to(np.vstack([T1, T1]), (S, ms, n0)))
    W = jnp.asarray(np.broadcast_to(np.vstack([W1, W1]), (S, ms, ns)))
    l = np.concatenate([np.full(ms // 2, -np.inf), np.ones(ms // 2)])
    u = np.concatenate([np.zeros(ms // 2), np.full(ms // 2, np.inf)])
    p = BlockAngularProblem(
        Q0=jnp.eye(n0), Qs=jnp.asarray(np.broadcast_to(np.eye(ns),
                                                       (S, ns, ns))),
        q0=jnp.zeros(n0), qs=jnp.zeros((S, ns)),
        T=T, W=W,
        l=jnp.asarray(np.broadcast_to(l, (S, ms))),
        u=jnp.asarray(np.broadcast_to(u, (S, ms))),
        c=jnp.asarray(0.0))
    res = solve_block_angular_result(p, qt.Settings(max_iter=200))
    assert int(res.info.status_val) == qt.PRIMAL_INFEASIBLE
    dy = np.asarray(res.prim_inf_cert)
    assert np.all(np.isfinite(dy)) and np.max(np.abs(dy)) > 0
    # Farkas check on the assembled dense problem
    dense = to_dense_problem(p)
    A = np.asarray(dense.A)
    dyf = dy.ravel()
    assert np.max(np.abs(A.T @ dyf)) <= 1e-4 * np.max(np.abs(dyf))
    lv, uv = np.asarray(p.l).ravel(), np.asarray(p.u).ravel()
    support = (np.where(np.isfinite(uv), uv, 0.0) @ np.maximum(dyf, 0)
               + np.where(np.isfinite(lv), lv, 0.0) @ np.minimum(dyf, 0))
    assert support < 0
