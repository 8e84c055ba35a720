"""Standalone probe: one sparse-path Newton solve on TPU vs CPU reference.

Tests the hypothesis that the on-TPU sparse stall (rp plateau identical
across CG variants) is CG returning garbage/zeros on the device."""
import sys, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
import qpdo_tpu as qt
from qpdo_tpu.solver.sparse import setup_sparse
from qpdo_tpu.solver.core import as_operator

rng = np.random.default_rng(11)
n, m = 2000, 1500
B = sps.random(n, n, density=4.0 / n, random_state=11, format="csr")
Q = (B.T @ B + 0.1 * sps.eye(n)).tocsr()
A = sps.random(m, n, density=6.0 / n, random_state=12, format="csr")
q = rng.standard_normal(n)
l, u = -rng.random(m), rng.random(m)

for tag, s in [
    # NOTE: no f64-preconditioner variant — a float64 block-Jacobi
    # Cholesky on the TPU is the documented device-crash path
    # (CLAUDE.md); precond_dtype="float32" everywhere on-device.
    ("precond_f32", qt.Settings(newton_direct=False, mu_min=1e-7,
                                precond_dtype="float32")),
    ("jacobi", qt.Settings(newton_direct=False, mu_min=1e-7,
                           precond="jacobi")),
]:
    op = as_operator(setup_sparse(Q, q, A, l, u, 0.0, dtype="float64",
                              precond=s.precond,
                              precond_block=s.precond_block))
    mvec = jnp.full((m,), 1e-2)
    active = (jnp.arange(m) % 3 == 0).astype(jnp.float64)
    rhs = jnp.asarray(rng.standard_normal(n))
    dx = jax.jit(lambda a, mu, r: op.newton_solve(
        a, mu, jnp.asarray(1e-3), r, s))(active, mvec, rhs)
    # residual in the operator's own (scaled) space
    w = active / mvec
    Kdx = np.asarray(op.Qmv(dx) + 1e-3 * dx + op.Atmv(w * op.Amv(dx)))
    dx = np.asarray(dx)
    rel = np.linalg.norm(Kdx - np.asarray(rhs)) / np.linalg.norm(rhs)
    print(json.dumps({"variant": tag, "dx_norm": float(np.linalg.norm(dx)),
                      "rel_residual": float(rel),
                      "finite": bool(np.all(np.isfinite(dx)))}), flush=True)
