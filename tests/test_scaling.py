"""Ruiz equilibration invariants (src/scaling.c:24-91 semantics)."""

import jax.numpy as jnp
import numpy as np

import qpdo_tpu as qt
from qpdo_tpu.solver.scaling import ruiz_equilibrate, scale_problem


def test_ruiz_equilibrates_norms():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((30, 50)) * np.logspace(-3, 3, 50)
    A_s, D, E = ruiz_equilibrate(jnp.asarray(A), 10)
    A_s = np.asarray(A_s)
    # row and column inf-norms approach 1
    assert np.allclose(np.max(np.abs(A_s), axis=0), 1.0, atol=5e-2)
    assert np.allclose(np.max(np.abs(A_s), axis=1), 1.0, atol=5e-2)
    # A_s = E A D exactly
    np.testing.assert_allclose(A_s, np.asarray(E)[:, None] * A * np.asarray(D),
                               rtol=1e-12)


def test_zero_rows_columns_safe():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((10, 12))
    A[3, :] = 0.0
    A[:, 5] = 0.0
    A_s, D, E = ruiz_equilibrate(jnp.asarray(A), 10)
    assert np.all(np.isfinite(np.asarray(A_s)))
    assert np.all(np.isfinite(np.asarray(D)))
    assert np.all(np.isfinite(np.asarray(E)))


def test_scale_problem_roundtrip():
    rng = np.random.default_rng(2)
    n, m = 12, 8
    M = rng.standard_normal((n, n))
    Q = M @ M.T
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    l = -np.ones(m)
    u = np.ones(m)
    p = qt.make_problem(Q, q, A, l, u)
    sp = scale_problem(p, 10)
    d, sc = sp.data, sp.scaling
    # scaled data relates to raw data via D, E, c
    np.testing.assert_allclose(np.asarray(d.A),
                               np.asarray(sc.E)[:, None] * A * np.asarray(sc.D),
                               rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(d.Q),
        float(sc.c) * np.asarray(sc.D)[:, None] * Q * np.asarray(sc.D)[None, :],
        rtol=1e-10)
    np.testing.assert_allclose(np.asarray(d.q),
                               float(sc.c) * np.asarray(sc.D) * q, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(d.l), np.asarray(sc.E) * l, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(d.u), np.asarray(sc.E) * u, rtol=1e-12)


def test_scaling_disabled_identity():
    rng = np.random.default_rng(3)
    n, m = 6, 4
    Q = np.eye(n)
    p = qt.make_problem(Q, rng.standard_normal(n),
                        rng.standard_normal((m, n)), -np.ones(m), np.ones(m))
    sp = scale_problem(p, 0)
    np.testing.assert_array_equal(np.asarray(sp.scaling.D), np.ones(n))
    np.testing.assert_array_equal(np.asarray(sp.scaling.E), np.ones(m))
    assert float(sp.scaling.c) == 1.0
    np.testing.assert_array_equal(np.asarray(sp.data.Q), Q)
