"""Fused KKT-formation Pallas kernel: interpret-mode parity with the XLA
baseline (explicit row-scale + batched GEMM)."""

import numpy as np

import jax.numpy as jnp

from qpdo_tpu.ops.pallas_formation import fused_formation, reference_formation


def test_fused_formation_matches_reference():
    rng = np.random.default_rng(3)
    for B, m, n in [(4, 150, 100), (2, 96, 64), (3, 256, 128)]:
        A = jnp.asarray(rng.standard_normal((B, m, n)), jnp.float32)
        w = jnp.asarray(rng.random((B, m)), jnp.float32)
        M = rng.standard_normal((B, n, n)).astype(np.float32)
        Q = jnp.asarray(np.einsum("bij,bkj->bik", M, M) / n)
        sigma = jnp.asarray(rng.random(B) * 0.1, jnp.float32)
        ref = reference_formation(A, w, Q, sigma)
        out = fused_formation(A, w, Q, sigma, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
