"""Padding inertness and heterogeneous bucketed solving."""

import numpy as np
import jax
import jax.numpy as jnp

import qpdo_tpu as qt
from qpdo_tpu.utils.padding import (bucket_problems, pad_problem,
                                    solve_heterogeneous, unpad_result)

from utils import kkt_residuals, random_qp


def _prob(n, m, seed):
    Q, q, A, l, u = random_qp(n, m, seed=seed)
    return qt.make_problem(Q, q, A, l, u), (Q, q, A, l, u)


def test_padding_is_inert():
    """Padded solve must match the unpadded solve exactly (same iterates,
    same iteration count, same solution on the original coordinates)."""
    p, _ = _prob(20, 15, seed=0)
    res = qt.solve(p)
    padded = pad_problem(p, 32, 24)
    res_p = unpad_result(qt.solve(padded), 20, 15)
    assert int(res_p.info.status_val) == qt.SOLVED
    assert int(res_p.info.iterations) == int(res.info.iterations)
    np.testing.assert_allclose(np.asarray(res_p.x), np.asarray(res.x),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(res_p.y), np.asarray(res.y),
                               atol=1e-12)
    np.testing.assert_allclose(float(res_p.info.objective),
                               float(res.info.objective), rtol=1e-12)


def test_padding_infeasible_certs():
    Q = np.array([[1.0, 0.0], [0.0, 0.0]])
    q = np.array([1.0, 0.0])
    A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([-np.inf, 1.0, 1.0])
    u = np.array([0.0, 3.0, 3.0])
    p = qt.make_problem(Q, q, A, l, u)
    res = unpad_result(qt.solve(pad_problem(p, 8, 8),
                                qt.Settings(max_iter=100)), 2, 3)
    assert int(res.info.status_val) == qt.PRIMAL_INFEASIBLE
    dy = np.asarray(res.prim_inf_cert)
    assert np.max(np.abs(A.T @ dy)) / np.max(np.abs(dy)) <= 1e-4


def test_bucketing():
    probs = [_prob(10, 8, 1)[0], _prob(12, 6, 2)[0], _prob(40, 33, 3)[0],
             _prob(9, 7, 4)[0]]
    buckets = bucket_problems(probs, n_mult=16, m_mult=16)
    # 10/12/9 -> (16,16); 40,33 -> (48,48)
    assert set(buckets.keys()) == {(16, 16), (48, 48)}
    assert sorted(buckets[(16, 16)][1]) == [0, 1, 3]


def test_solve_heterogeneous():
    raw = [(15, 10, 5), (20, 30, 6), (50, 40, 7), (17, 12, 8)]
    probs, datas = [], []
    for n, m, s in raw:
        p, d = _prob(n, m, s)
        probs.append(p)
        datas.append(d)
    results = solve_heterogeneous(probs)
    for (n, m, _), (Q, q, A, l, u), res in zip(raw, datas, results):
        assert int(res.info.status_val) == qt.SOLVED
        assert res.x.shape == (n,)
        rp, rd = kkt_residuals(Q, q, A, l, u, res.x, res.y)
        assert rp <= 1e-6 and rd <= 1e-6


def test_vmapped_padding_batch_inert():
    """The bench.py QPDO_BENCH_PAD path: a vmapped pad_problem over a
    stacked batch, solved lock-step, must match the unpadded batched
    solve on the original coordinates (MXU-alignment padding must never
    change what is computed, only how it tiles)."""
    from qpdo_tpu.parallel.batch import solve_batch

    B, n, m = 6, 20, 30
    rng = np.random.default_rng(5)
    M = rng.standard_normal((B, n, n))
    Q = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    probs = qt.Problem(
        Q=jnp.asarray(Q), q=jnp.asarray(rng.standard_normal((B, n))),
        A=jnp.asarray(rng.standard_normal((B, m, n))),
        l=jnp.asarray(-rng.random((B, m))),
        u=jnp.asarray(rng.random((B, m))),
        c=jnp.zeros((B,)))
    padded = jax.vmap(lambda p: pad_problem(p, 32, 40))(probs)
    assert padded.A.shape == (B, 40, 32)

    res = solve_batch(probs)
    res_p = solve_batch(padded)
    np.testing.assert_array_equal(np.asarray(res_p.info.status_val),
                                  np.asarray(res.info.status_val))
    np.testing.assert_array_equal(np.asarray(res_p.info.iterations),
                                  np.asarray(res.info.iterations))
    np.testing.assert_allclose(np.asarray(res_p.x)[:, :n],
                               np.asarray(res.x), atol=1e-10)
    # padded tail provably at zero
    np.testing.assert_allclose(np.asarray(res_p.x)[:, n:], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res_p.y)[:, m:], 0.0, atol=1e-12)
