"""Fused Pallas KKT kernel: interpret-mode correctness on CPU."""

import numpy as np
import jax.numpy as jnp

from qpdo_tpu.ops.pallas_kkt import pallas_kkt_solve


def test_matches_dense_solve():
    B, n, m = 3, 128, 256
    rng = np.random.default_rng(0)
    M = rng.standard_normal((B, n, n)).astype(np.float32)
    Q = (np.einsum("bij,bkj->bik", M, M) / n
         + 0.1 * np.eye(n)).astype(np.float32)
    A = rng.standard_normal((B, m, n)).astype(np.float32)
    w = (rng.random((B, m)) * 10).astype(np.float32)
    sigma = np.full(B, 1e-3, np.float32)
    rhs = rng.standard_normal((B, n)).astype(np.float32)

    dx = np.asarray(pallas_kkt_solve(
        jnp.asarray(Q), jnp.asarray(A), jnp.asarray(w),
        jnp.asarray(sigma), jnp.asarray(rhs), interpret=True))

    for b in range(B):
        K = (Q[b].astype(np.float64) + sigma[b] * np.eye(n)
             + A[b].T.astype(np.float64)
             @ (w[b][:, None] * A[b]).astype(np.float64))
        dx_ref = np.linalg.solve(K, rhs[b].astype(np.float64))
        err = (np.max(np.abs(dx[b] - dx_ref))
               / max(1.0, np.max(np.abs(dx_ref))))
        assert err < 5e-6, f"problem {b}: rel err {err}"


def test_inactive_rows_ignored():
    """w = 0 rows (inactive constraints) must not contribute."""
    B, n, m = 1, 128, 256
    rng = np.random.default_rng(1)
    M = rng.standard_normal((B, n, n)).astype(np.float32)
    Q = (np.einsum("bij,bkj->bik", M, M) / n
         + 0.5 * np.eye(n)).astype(np.float32)
    A = rng.standard_normal((B, m, n)).astype(np.float32)
    w = np.zeros((B, m), np.float32)
    sigma = np.full(B, 1e-3, np.float32)
    rhs = rng.standard_normal((B, n)).astype(np.float32)
    dx = np.asarray(pallas_kkt_solve(
        jnp.asarray(Q), jnp.asarray(A), jnp.asarray(w),
        jnp.asarray(sigma), jnp.asarray(rhs), interpret=True))
    K = Q[0].astype(np.float64) + sigma[0] * np.eye(n)
    dx_ref = np.linalg.solve(K, rhs[0].astype(np.float64))
    assert np.max(np.abs(dx[0] - dx_ref)) < 1e-4


def test_stacked_chol_solve_interpret():
    """Batch-in-sublanes stacked Cholesky kernel (G=8 problems per
    program) matches a dense solve in interpret mode."""
    import jax.numpy as jnp
    from qpdo_tpu.ops.pallas_kkt import pallas_chol_solve_stacked

    B, n = 16, 128
    rng = np.random.default_rng(5)
    M = rng.standard_normal((B, n, n)).astype(np.float32)
    K = np.einsum("bik,bjk->bij", M, M) / n + 0.5 * np.eye(n,
                                                           dtype=np.float32)
    rhs = rng.standard_normal((B, n)).astype(np.float32)
    dx = pallas_chol_solve_stacked(jnp.asarray(K), jnp.asarray(rhs),
                                   interpret=True)
    ref = np.stack([np.linalg.solve(K[b], rhs[b]) for b in range(B)])
    err = np.max(np.abs(np.asarray(dx) - ref)) / np.max(np.abs(ref))
    assert err < 5e-4
