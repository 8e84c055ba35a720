"""Mixed-pattern sparse-fleet fuzz: random fleets whose members have
DIFFERENT sparsity patterns (union-pattern rebuild in solve_sparse_batch),
each batch result pinned against the member's individual solve and
oracle-verified.  Chunked via FUZZ_LO/FUZZ_HI like fuzz_campaign.py."""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, sys, os, time, traceback
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
import scipy.sparse as sps
import qpdo_tpu as qt


def gen_fleet(rng):
    n = int(rng.integers(30, 250))
    m = int(rng.integers(max(2, n // 2), int(1.5 * n)))
    B = int(rng.integers(2, 7))
    probs = []
    for _ in range(B):
        dens_q = float(rng.uniform(2.0, 6.0)) / n
        dens_a = float(rng.uniform(2.0, 8.0)) / n
        Bm = sps.random(n, n, density=dens_q,
                        random_state=int(rng.integers(2**31)))
        Q = (Bm.T @ Bm + float(rng.uniform(0.05, 1.0))
             * sps.eye(n)).tocsr()
        A = sps.random(m, n, density=dens_a,
                       random_state=int(rng.integers(2**31)), format="csr")
        # guarantee no empty rows
        A = A + sps.csr_matrix((rng.standard_normal(m),
                                (np.arange(m), rng.integers(0, n, m))),
                               shape=(m, n))
        l = -rng.random(m) - 0.05
        u = rng.random(m) + 0.05
        probs.append((Q, rng.standard_normal(n), A, l, u))
    return probs


lo = int(os.environ.get("FUZZ_LO", "0")); hi = int(os.environ.get("FUZZ_HI", "20"))
fails = 0
t0 = time.time()
for seed in range(lo, hi):
    rng = np.random.default_rng(90000 + seed)
    probs = gen_fleet(rng)
    s = qt.Settings(max_iter=20000, max_time=300.0)
    try:
        res = qt.solve_sparse_batch(probs, s, dtype="float64")
        for b, (Q, q, A, l, u) in enumerate(probs):
            st = int(res.info.status_val[b])
            single = qt.solve_sparse(Q, q, A, l, u, settings=s,
                                     dtype="float64")
            if st != int(single.info.status_val):
                fails += 1
                print(f"FAIL seed={seed} b={b}: batch status {st} != "
                      f"single {int(single.info.status_val)}", flush=True)
                continue
            if st == qt.SOLVED:
                x, y = np.asarray(res.x[b]), np.asarray(res.y[b])
                Ax = np.asarray(A @ x)
                rp = np.abs(Ax - np.clip(Ax + y, l, u)).max()
                rd = np.abs(Q @ x + q + A.T @ y).max()
                # the union pattern may flip the Newton backend (banded
                # detection / preconditioner blocks see more structural
                # entries), so two VALID eps-tolerance solutions can
                # differ by O(eps*cond) — the oracle is the correctness
                # gate; the x-pin only catches gross divergence
                dx = np.abs(x - np.asarray(single.x)).max()
                if not (rp <= 1.1e-6 and rd <= 1.1e-6 and dx <= 1e-3):
                    fails += 1
                    print(f"FAIL seed={seed} b={b}: rp={rp:.1e} "
                          f"rd={rd:.1e} dx_vs_single={dx:.1e}", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL seed={seed}: exception", flush=True)
        traceback.print_exc()
    if (seed - lo) % 5 == 4:
        print(f"... {seed+1-lo}/{hi-lo}, {fails} fails, "
              f"{time.time()-t0:.0f}s", flush=True)
print(f"chunk [{lo},{hi}) done: {fails} fails, {time.time()-t0:.0f}s",
      flush=True)
