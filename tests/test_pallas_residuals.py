"""Fused residual+norm Pallas kernel: interpret-mode parity with the jnp
reference block (the XLA baseline it is benchmarked against on-TPU)."""

import numpy as np

import jax.numpy as jnp

from qpdo_tpu.ops.pallas_residuals import fused_residuals, reference_residuals


def _inputs(B, n, m, seed=0):
    rng = np.random.default_rng(seed)
    d = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    Ax, y, ybar = d(B, m), d(B, m), d(B, m)
    mu = jnp.asarray(rng.random((B, m)) + 0.1, jnp.float32)
    l = -jnp.asarray(rng.random((B, m)) + 0.2, jnp.float32)
    u = jnp.asarray(rng.random((B, m)) + 0.2, jnp.float32)
    E = jnp.asarray(rng.random((B, m)) + 0.5, jnp.float32)
    Qx, q, Aty, x, xbar = d(B, n), d(B, n), d(B, n), d(B, n), d(B, n)
    Dinv = jnp.asarray(rng.random((B, n)) + 0.5, jnp.float32)
    sigma = jnp.asarray(rng.random(B) * 0.1, jnp.float32)
    cinv = jnp.asarray(rng.random(B) + 0.5, jnp.float32)
    return (Ax, y, mu, ybar, l, u, E, 1.0 / E,
            Qx, q, Aty, x, xbar, Dinv, sigma, cinv)


def test_fused_residuals_matches_reference():
    for B, n, m in [(8, 100, 150), (16, 64, 96), (4, 128, 256)]:
        args = _inputs(B, n, m, seed=B)
        ref = reference_residuals(*args)
        out = fused_residuals(*args, interpret=True)
        names = ["res_prim", "res_prim_in", "w", "active",
                 "res_dual_in", "rp", "rd", "rpi", "rdi"]
        for name, a, b in zip(names, out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6, err_msg=name)
