"""Row-sharded single-QP solving (the sequence-parallel analogue,
SURVEY.md §5): constraint rows over an 8-device mesh, pinned against the
unsharded dense path."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import qpdo_tpu as qt
from qpdo_tpu.parallel import solve_row_sharded

from utils import random_qp


def test_matches_unsharded():
    """m=400 rows sharded over 8 devices: same solution as the local
    solve (bisect linesearch on both sides for identical trajectories)."""
    n, m = 60, 400
    Q, q, A, l, u = random_qp(n, m, seed=0)
    p = qt.make_problem(Q, q, A, l, u)
    s = qt.Settings(linesearch="bisect")
    ref = qt.solve(p, s)
    res, m_orig = solve_row_sharded(p, s)
    assert m_orig == m
    assert int(res.info.status_val) == qt.SOLVED
    assert int(res.info.iterations) == int(ref.info.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.y)[:m], np.asarray(ref.y),
                               atol=1e-9)


def test_row_padding_inert():
    """m not divisible by the device count: inert-row padding leaves the
    solution unchanged and the padded dual tail at zero."""
    n, m = 30, 101
    Q, q, A, l, u = random_qp(n, m, seed=4)
    p = qt.make_problem(Q, q, A, l, u)
    ref = qt.solve(p, qt.Settings(linesearch="bisect"))
    res, m_orig = solve_row_sharded(p)
    assert int(res.info.status_val) == qt.SOLVED
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-8)
    np.testing.assert_array_equal(np.asarray(res.y)[m_orig:], 0.0)


def test_collectives_in_hlo():
    """The row contraction really is distributed: the compiled HLO of the
    sharded solve contains an all-reduce."""
    n, m = 20, 80
    Q, q, A, l, u = random_qp(n, m, seed=2)
    p = qt.make_problem(Q, q, A, l, u)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("rows",))
    row = NamedSharding(mesh, P("rows"))
    mat = NamedSharding(mesh, P("rows", None))
    repl = NamedSharding(mesh, P())
    p = qt.Problem(Q=jax.device_put(p.Q, repl), q=jax.device_put(p.q, repl),
                   A=jax.device_put(p.A, mat), l=jax.device_put(p.l, row),
                   u=jax.device_put(p.u, row), c=jax.device_put(p.c, repl))
    from qpdo_tpu.api import _solve_full
    s = qt.Settings(linesearch="bisect")
    compiled = _solve_full.lower(p, s, None, None, False, False).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo


def test_warm_start_row_sharded():
    n, m = 40, 160
    Q, q, A, l, u = random_qp(n, m, seed=7)
    p = qt.make_problem(Q, q, A, l, u)
    cold, _ = solve_row_sharded(p)
    res, m_orig = solve_row_sharded(p, x0=cold.x, y0=np.asarray(cold.y)[:m])
    assert int(res.info.status_val) == qt.SOLVED
    assert int(res.info.iterations) < int(cold.info.iterations)


def test_row_sharded_with_polish():
    """polish=True composes with the row-sharded path: the saddle LU runs
    under GSPMD (XLA repartitions the sharded rows) and the polished
    result is oracle-verified."""
    import numpy as np

    import qpdo_tpu as qt
    from qpdo_tpu.parallel import solve_row_sharded

    rng = np.random.default_rng(4)
    n, m = 24, 32
    M = rng.standard_normal((n, n))
    Q = M @ M.T / n + 0.1 * np.eye(n)
    p = qt.make_problem(Q, rng.standard_normal(n),
                        rng.standard_normal((m, n)), -np.ones(m), np.ones(m))
    res, m_orig = solve_row_sharded(p, qt.Settings(polish=True))
    assert int(res.info.status_val) == qt.SOLVED
    x = np.asarray(res.x)
    y = np.asarray(res.y)[:m_orig]
    A = np.asarray(p.A)
    l = np.asarray(p.l)
    u = np.asarray(p.u)
    Ax = A @ x
    assert np.abs(Ax - np.clip(Ax + y, l, u)).max() < 1e-6
    assert np.abs(Q @ x + np.asarray(p.q) + A.T @ y).max() < 1e-6
