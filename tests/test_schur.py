"""Distributed Schur-complement solve tests (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from qpdo_tpu.ops.schur import (ArrowSystem, arrow_solve,
                                arrow_solve_sharded, arrow_to_dense)


def _random_arrow(S=8, n0=6, ns=10, seed=0):
    rng = np.random.default_rng(seed)
    M0 = rng.standard_normal((n0, n0))
    K00 = M0 @ M0.T + (S + 1) * np.eye(n0)  # keep the Schur complement SPD
    Ms = rng.standard_normal((S, ns, ns))
    Kss = np.einsum("sij,skj->sik", Ms, Ms) + ns * np.eye(ns)
    Bs = 0.3 * rng.standard_normal((S, ns, n0))
    r0 = rng.standard_normal(n0)
    rs = rng.standard_normal((S, ns))
    sys_ = ArrowSystem(K00=jnp.asarray(K00), Kss=jnp.asarray(Kss),
                       Bs=jnp.asarray(Bs))
    return sys_, jnp.asarray(r0), jnp.asarray(rs)


def _check(sys_, r0, rs, x0, xs, tol=1e-8):
    K = np.asarray(arrow_to_dense(sys_))
    r = np.concatenate([np.asarray(r0), np.asarray(rs).ravel()])
    x = np.concatenate([np.asarray(x0), np.asarray(xs).ravel()])
    assert np.max(np.abs(K @ x - r)) <= tol * max(1.0, np.max(np.abs(r)))


def test_arrow_solve_reference():
    sys_, r0, rs = _random_arrow()
    x0, xs = arrow_solve(sys_, r0, rs)
    _check(sys_, r0, rs, x0, xs)


def test_arrow_solve_sharded_matches():
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), ("scenario",))
    sys_, r0, rs = _random_arrow(S=16)
    x0_ref, xs_ref = arrow_solve(sys_, r0, rs)
    x0, xs = arrow_solve_sharded(sys_, r0, rs, mesh)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x0_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), atol=1e-9)
    _check(sys_, r0, rs, x0, xs)


def test_arrow_solve_sharded_jit():
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:4]), ("scenario",))
    sys_, r0, rs = _random_arrow(S=8, seed=3)
    f = jax.jit(lambda s, a, b: arrow_solve_sharded(s, a, b, mesh))
    x0, xs = f(sys_, r0, rs)
    _check(sys_, r0, rs, x0, xs)
