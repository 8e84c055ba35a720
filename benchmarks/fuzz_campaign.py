"""Extended fuzz campaign (run in chunks: FUZZ_LO/FUZZ_HI env, <=50
seeds per process — the XLA-CPU LLVM allocator exhausts memory around
~100 distinct jit compilations in one process): the test_fuzz generator x a settings grid
(polish / accel / kktrows / hybrid / linesearch), every SOLVED claim
oracle-verified, every infeasibility certificate Farkas-checked."""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, sys, itertools, traceback, time
import os
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root); sys.path.insert(0, os.path.join(_root, "tests"))
import qpdo_tpu as qt
from test_fuzz import _gen

GRID = [
    dict(),
    dict(polish=True),
    dict(polish=True, hybrid_warmup=True, kkt_dtype="float32",
         refine_steps=2, mu_min=1e-7, warmup_eps=1e-3),
    dict(accel_gamma=0.5),
    dict(polish=True, accel_gamma=0.5),
    dict(kkt_update_rows=8, refine_steps=2),
    dict(polish=True, kkt_update_rows=8, refine_steps=2),
    dict(linesearch="bisect", polish=True),
    dict(hybrid_warmup=True, kkt_dtype="float32", refine_steps=2,
         mu_min=1e-7, polish=True, phase2_gemm_dtype="float32"),
    # round-5 factorization-free dense Newton modes
    dict(kkt_solver="ns", kkt_ns_steps=5, kkt_inv_refresh=False),
    dict(kkt_solver="ns", kkt_ns_steps=3, polish=True, hybrid_warmup=True,
         kkt_dtype="float32", refine_steps=2, mu_min=1e-7,
         warmup_eps=1e-3, kkt_inv_refresh=False),
    dict(kkt_solver="inv"),
]
fails = 0
t_start = time.time()
import os
lo = int(os.environ.get("FUZZ_LO", "0")); hi = int(os.environ.get("FUZZ_HI", "200"))
for seed in range(lo, hi):
    rng = np.random.default_rng(50000 + seed)
    Q, q, A, l, u = _gen(rng)
    p = qt.make_problem(Q, q, A, l, u)
    cfg = GRID[seed % len(GRID)]
    s = qt.Settings(max_iter=3000, **cfg)
    try:
        res = qt.solve(p, s)
        st = int(res.info.status_val)
        lc = np.clip(l, -qt.QPDO_INFTY, qt.QPDO_INFTY)
        uc = np.clip(u, -qt.QPDO_INFTY, qt.QPDO_INFTY)
        if st == qt.SOLVED:
            x, y = np.asarray(res.x), np.asarray(res.y)
            Ax = A @ x
            rp = np.abs(Ax - np.clip(Ax + y, lc, uc)).max()
            rd = np.abs(Q @ x + q + A.T @ y).max()
            if not (rp <= 1.1e-6 and rd <= 1.1e-6):
                fails += 1
                print(f"FAIL seed={seed} cfg={cfg}: claimed SOLVED rp={rp:.1e} rd={rd:.1e}", flush=True)
        elif st == qt.PRIMAL_INFEASIBLE:
            dy = np.asarray(res.prim_inf_cert)
            ok = (np.abs(A.T @ dy).max() <= 1e-4 * np.abs(dy).max() + 1e-10)
            if not ok:
                fails += 1
                print(f"FAIL seed={seed} cfg={cfg}: bad Farkas cert", flush=True)
        elif st not in (qt.DUAL_INFEASIBLE, qt.MAX_ITER_REACHED, qt.NON_CVX):
            fails += 1
            print(f"FAIL seed={seed} cfg={cfg}: unexpected status {st}", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL seed={seed} cfg={cfg}: exception", flush=True)
        traceback.print_exc()
    if (seed - lo) % 20 == 19:
        print(f"... {seed+1-lo}/{hi-lo} done, {fails} fails, {time.time()-t_start:.0f}s", flush=True)
print(f"chunk [{lo},{hi}) done: {fails} fails, {time.time()-t_start:.0f}s", flush=True)
