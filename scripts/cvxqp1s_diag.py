"""Trajectory diagnostic for the CVXQP1S mu_min=1e-9 blowup (round-4
verdict weak #5): the n=1000 scale-stressed CVXQP instance takes 3,459
iterations / 630 s at mu_min=1e-9 (F32CFG) where its siblings take
double digits — 84% of the whole mm_like suite wall.

Drives the solver step-by-step (core.step on the SparseOperator) and
prints, every PRINT_EVERY iterations: outer/inner residual norms, the
mu distribution (min/median/max), sigma, eps_in, active-set size and
churn — at mu_min 1e-7 vs 1e-9, plus candidate fixes (ruiz_kkt,
theta/delta variants).

Usage: python scripts/cvxqp1s_diag.py [configs...]
  configs: mu7 mu9 mu9_ruizkkt mu9_theta (default: mu7 mu9)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import importlib.util

spec = importlib.util.spec_from_file_location(
    "mm_like", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "mm_like.py"))
mm = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mm)

import qpdo_tpu as qt
from qpdo_tpu.solver import core
from qpdo_tpu.solver.sparse import setup_sparse

PRINT_EVERY = int(os.environ.get("QPDO_DIAG_EVERY", "100"))
MAX_IT = int(os.environ.get("QPDO_DIAG_MAXIT", "4000"))


def get_instance():
    rng = np.random.default_rng(42)
    suite = mm.build_suite(rng, 2048)   # the round-4 log's max_n
    for name, fam, Q, q, A, l, u in suite:
        if name == "CVXQP1S029":
            return name, Q, q, A, l, u
    raise SystemExit("instance not found")


def run(name, Q, q, A, l, u, settings, label):
    op = setup_sparse(Q, q, A, l, u, 0.0, settings.scaling,
                      precond=settings.precond,
                      precond_block=settings.precond_block,
                      ruiz_kkt=settings.ruiz_kkt)
    s = jax.jit(core.init_state, static_argnames=(
        "settings", "warm_x", "warm_y"))(op, settings, None, None,
                                         False, False)
    step = jax.jit(core.step, static_argnames=("settings",))

    print(f"=== {label} ===", flush=True)
    t0 = time.perf_counter()
    prev_act = None
    churn_acc = 0
    oter_prev = 0
    from qpdo_tpu import constants as _c
    while int(s.status) == _c.UNSOLVED and int(s.iter) < MAX_IT:
        # active set from the current state (w vs bounds), for churn
        it = int(s.iter)
        if it % PRINT_EVERY == 0:
            mu = np.asarray(s.mu)
            print(f"it={it:5d} ot={int(s.oter):4d} "
                  f"rp={float(s.res_prim_norm):.2e} "
                  f"rd={float(s.res_dual_norm):.2e} "
                  f"rpi={float(s.res_prim_in_norm):.2e} "
                  f"rdi={float(s.res_dual_in_norm):.2e} "
                  f"mu=[{mu.min():.1e},{np.median(mu):.1e},{mu.max():.1e}]"
                  f" #mu@floor={int((mu <= settings.mu_min*1.01).sum()):4d}"
                  f" sg={float(s.sigma):.1e} eps_in={float(s.eps_in):.1e}"
                  f" tau={float(s.tau):.2f}", flush=True)
        s = step(op, settings, s)
    wall = time.perf_counter() - t0
    print(f"--- {label}: status={int(s.status)} iters={int(s.iter)} "
          f"outer={int(s.oter)} wall={wall:.1f}s", flush=True)


def main():
    name, Q, q, A, l, u = get_instance()
    print(f"instance {name}: n={Q.shape[0]} m={A.shape[0]}")
    base = qt.Settings(eps_abs=1e-6, max_iter=30000, inner_max_iter=100,
                       eps_abs_in=0.1, rho=0.02, delta=0.1,
                       max_time=1800.0, precond_block=64,
                       kkt_dtype="float32", precond_dtype="float32",
                       cg_dtype="float32", refine_steps=3)
    configs = {
        "mu7": (base.replace(mu_min=1e-7), "mu_min=1e-7 (historical)"),
        "mu9": (base.replace(mu_min=1e-9), "mu_min=1e-9 (reference)"),
        "mu9_ruizkkt": (base.replace(mu_min=1e-9, ruiz_kkt=True),
                        "mu_min=1e-9 + ruiz_kkt"),
        "mu9_theta": (base.replace(mu_min=1e-9, theta=0.9, delta=0.01),
                      "mu_min=1e-9 + conservative mu schedule"),
        "mu9_f64": (base.replace(mu_min=1e-9, kkt_dtype=None,
                                 precond_dtype=None, cg_dtype=None),
                    "mu_min=1e-9 pure f64"),
    }
    picks = sys.argv[1:] or ["mu7", "mu9"]
    for p in picks:
        st, label = configs[p]
        run(name, Q, q, A, l, u, st, label)


if __name__ == "__main__":
    main()
