"""Sparse-path fuzz campaign: random sparse structures (banded / general /
rank-deficient / equality-heavy / wide-scale) x the sparse settings grid
(direct-banded vs CG, mixed-precision CG, hybrid warmup, ruiz_kkt), every
SOLVED claim oracle-verified.  Chunked via FUZZ_LO/FUZZ_HI like
fuzz_campaign.py.

QPDO_FUZZ_PLATFORM=axon runs the campaign on the attached TPU with the
TPU-safe settings grid (every direct factorization in float32 — a float64
Cholesky on the axon chip is the documented device-crash path).  Each
(seed, config) cell is a fresh shape, hence a fresh ~1-2 min TPU compile:
size the chunk accordingly (FUZZ_LO/FUZZ_HI), e.g. 12 cells ~ 30-60 min."""
import os

import jax

jax.config.update("jax_platforms",
                  os.environ.get("QPDO_FUZZ_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)
import numpy as np, sys, time, traceback
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
import scipy.sparse as sps
import qpdo_tpu as qt

def gen(rng):
    n = int(rng.integers(50, 800))
    kind = rng.integers(0, 4)
    if kind == 0:      # banded (second differences)
        m = n - 2
        rows = np.repeat(np.arange(m), 3)
        cols = (np.arange(m)[:, None] + np.arange(3)[None, :]).ravel()
        A = sps.csr_matrix((np.tile([1.0, -2.0, 1.0], m), (rows, cols)),
                           shape=(m, n))
        Q = sps.eye(n, format="csr") * (1 + rng.random())
        l = np.zeros(m); u = np.full(m, np.inf)
    else:              # general sparse
        m = int(rng.integers(max(1, n // 2), 2 * n))
        B = sps.random(n, n, density=4.0 / n, random_state=int(rng.integers(2**31)))
        Q = (B.T @ B + (0.01 if kind == 2 else 0.5) * sps.eye(n)).tocsr()
        A = sps.random(m, n, density=min(8.0 / n, 0.5),
                       random_state=int(rng.integers(2**31)), format="csr")
        A = A + sps.csr_matrix((rng.standard_normal(m),
                                (np.arange(m), rng.integers(0, n, m))),
                               shape=(m, n))
        l = -rng.random(m); u = rng.random(m)
        if kind == 3:  # equality-heavy, anchored feasible
            x0 = rng.standard_normal(n) * 0.1
            b = np.asarray(A @ x0)
            eq = rng.random(m) < 0.5
            l = np.where(eq, b, l - np.abs(b))
            u = np.where(eq, b, u + np.abs(b))
    q = rng.standard_normal(n)
    return Q, q, A, l, u

GRID = [
    dict(),
    dict(newton_direct=False),
    dict(newton_direct=False, cg_dtype="float32", precond_dtype="float32",
         mu_min=1e-7),
    dict(hybrid_warmup=True, warmup_eps=1e-3, cg_dtype="float32",
         precond_dtype="float32", mu_min=1e-7),
    dict(ruiz_kkt=True),
    dict(precond="jacobi", newton_direct=False),
]
if jax.config.jax_platforms not in (None, "cpu"):
    # same six coverage axes, every factorization (banded direct, block-
    # Jacobi preconditioner) pinned to float32 + the mu_min>=1e-7 rule
    GRID = [
        dict(kkt_dtype="float32", mu_min=1e-7, refine_steps=3),
        dict(newton_direct=False, precond_dtype="float32", mu_min=1e-7),
        dict(newton_direct=False, cg_dtype="float32",
             precond_dtype="float32", mu_min=1e-7),
        dict(hybrid_warmup=True, warmup_eps=1e-3, cg_dtype="float32",
             precond_dtype="float32", mu_min=1e-7),
        dict(ruiz_kkt=True, kkt_dtype="float32", mu_min=1e-7,
             refine_steps=3),
        dict(precond="jacobi", newton_direct=False, mu_min=1e-7),
    ]
lo = int(os.environ.get("FUZZ_LO", "0")); hi = int(os.environ.get("FUZZ_HI", "60"))
fails = 0
t0 = time.time()
for seed in range(lo, hi):
    rng = np.random.default_rng(70000 + seed)
    Q, q, A, l, u = gen(rng)
    # stamped start line (flushed): on-TPU a cell is a multi-minute fresh
    # compile — without this the log is silent for ~10 cells and looks hung
    print(f"cell seed={seed} cfg={seed % len(GRID)} n={Q.shape[0]} "
          f"m={A.shape[0]} t={time.time()-t0:.0f}s", flush=True)
    s = qt.Settings(max_iter=20000, max_time=300.0, **GRID[seed % len(GRID)])
    try:
        res = qt.solve_sparse(Q, q, A, l, u, settings=s, dtype="float64")
        st = int(res.info.status_val)
        print(f"done seed={seed} status={st} "
              f"iters={int(res.info.iterations)} t={time.time()-t0:.0f}s",
              flush=True)
        if st == qt.SOLVED:
            x, y = np.asarray(res.x), np.asarray(res.y)
            Ax = np.asarray(A @ x)
            rp = np.abs(Ax - np.clip(Ax + y, l, u)).max()
            rd = np.abs(Q @ x + q + A.T @ y).max()
            if not (rp <= 1.1e-6 and rd <= 1.1e-6):
                fails += 1
                print(f"FAIL seed={seed} cfg={seed % len(GRID)}: SOLVED but rp={rp:.1e} rd={rd:.1e}", flush=True)
        elif st not in (qt.PRIMAL_INFEASIBLE, qt.DUAL_INFEASIBLE,
                        qt.MAX_ITER_REACHED, qt.MAX_TIME_REACHED, qt.NON_CVX):
            fails += 1
            print(f"FAIL seed={seed}: unexpected status {st}", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL seed={seed} cfg={seed % len(GRID)}: exception", flush=True)
        traceback.print_exc()
    if (seed - lo) % 10 == 9:
        print(f"... {seed+1-lo}/{hi-lo}, {fails} fails, {time.time()-t0:.0f}s", flush=True)
print(f"chunk [{lo},{hi}) done: {fails} fails, {time.time()-t0:.0f}s", flush=True)
