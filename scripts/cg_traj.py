import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import scipy.sparse as sps
import qpdo_tpu as qt

rng = np.random.default_rng(11)
n, m = 2000, 1500
B = sps.random(n, n, density=4.0 / n, random_state=11, format="csr")
Q = (B.T @ B + 0.1 * sps.eye(n)).tocsr()
A = sps.random(m, n, density=6.0 / n, random_state=12, format="csr")
q = rng.standard_normal(n)
l, u = -rng.random(m), rng.random(m)

s = qt.Settings(eps_abs=1e-6, newton_direct=False, mu_min=1e-7,
                hybrid_warmup=True, warmup_eps=1e-3,
                cg_dtype="float32", precond_dtype="float32",
                max_iter=300, verbose=True, print_interval=10)
t0 = time.perf_counter()
res = qt.solve_sparse(Q, q, A, l, u, settings=s, dtype="float64")
st = int(np.asarray(res.info.status_val))
print("status", st, "iters", int(res.info.iterations),
      "t", round(time.perf_counter() - t0, 1))
