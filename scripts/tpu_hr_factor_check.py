"""Compile+execute check of the hand-rolled f64 block factorization on
the real TPU — the state-dtype escalation path (_banded_factor_scan_hr)
must run under axon's f64 emulation where jnp.linalg.cholesky f64
crashes the device.  Also exercises the full _banded_solve escalation
gate at w = 1e9 (the mu=1e-9 regime) on-device."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from qpdo_tpu.operators import SparseOperator
from qpdo_tpu.solver.sparse import setup_sparse
import qpdo_tpu as qt

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

# 1. bare hr factor on a block-tridiagonal f64 system
nb, b = 64, 4
M = rng.standard_normal((nb, b, b))
D = jnp.asarray(M @ np.swapaxes(M, -1, -2) + 10 * b * np.eye(b))
E = jnp.asarray(0.3 * rng.standard_normal((nb - 1, b, b)))
rb = jnp.asarray(rng.standard_normal((nb, b)))
t0 = time.time()
z = jax.jit(lambda D, E, rb: SparseOperator._banded_factor_scan_hr(D, E)(rb))(D, E, rb)
z_host = np.asarray(z)
print(f"hr factor f64 on-device: {time.time()-t0:.1f}s "
      f"finite={np.all(np.isfinite(z_host))}", flush=True)
# verify vs host
Kd = np.zeros((nb * b, nb * b))
for k in range(nb):
    Kd[k*b:(k+1)*b, k*b:(k+1)*b] = np.asarray(D[k])
for k in range(nb - 1):
    Kd[(k+1)*b:(k+2)*b, k*b:(k+1)*b] = np.asarray(E[k])
    Kd[k*b:(k+1)*b, (k+1)*b:(k+2)*b] = np.asarray(E[k]).T
ref = np.linalg.solve(Kd, np.asarray(rb).reshape(-1))
err = np.max(np.abs(z_host.reshape(-1) - ref)) / np.max(np.abs(ref))
print(f"hr factor rel err vs host f64: {err:.2e}", flush=True)

# 2. the escalation gate inside _banded_solve at w=1e9 (LISWET n=1500)
n = 1500
Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
m = n - 2
rows = np.repeat(np.arange(m), 3)
cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
op = setup_sparse(Q, -np.ones(n), A, np.zeros(m), np.full(m, np.inf))
w = jnp.full((m,), 1e9)
sigma = jnp.asarray(1e-7)
rhs = jnp.asarray(rng.standard_normal(n))
s = qt.Settings(kkt_dtype="float32")
t0 = time.time()
dx = jax.jit(lambda w, sg, r: op._banded_solve(w, sg, r, s))(w, sigma, rhs)
dx_host = np.asarray(dx)
r = np.asarray(rhs) - np.asarray(
    op.Qmv(jnp.asarray(dx_host)) + op.Atmv(w * op.Amv(jnp.asarray(dx_host)))
    + sigma * jnp.asarray(dx_host))
rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(rhs))
print(f"escalated banded_solve on-device: {time.time()-t0:.1f}s "
      f"rel_res={rel:.2e} nonzero={np.any(dx_host != 0)}", flush=True)
print("OK" if rel < 1e-5 and np.any(dx_host != 0) else "FAIL", flush=True)
