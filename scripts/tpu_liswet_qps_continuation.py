"""QPS-ingested LISWET at n=50,000 through the continuation driver
(round-5, verdict item 7): BIGLISWET50K.qps is parsed by the native C++
QPS reader, the coarse ladder is rebuilt by RESTRICTING the ingested
data vector (q = -d on the fine grid), and the coarse-to-fine
continuation solve warm-starts each level — exercising ingest + the
banded direct path + grid prolongation as ONE pipeline at a scale a
cold solve legitimately cannot reach (the LISWET active-set crawl needs
~n iterations; see examples/continuation.py).

The FINE level's solution is oracle-verified against the QPS data
itself, so the ingest round-trip is part of the acceptance.

CPU by default (correctness config); QPDO_EX_TPU=1 for the device.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax

if not os.environ.get("QPDO_EX_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import scipy.sparse as sps  # noqa: E402

import qpdo_tpu as qt  # noqa: E402


def liswet_from_d(d_vec):
    n = d_vec.shape[0]
    Q = sps.eye(n, format="csr") * (1.0 + 1e-3)
    m = n - 2
    rows = np.repeat(np.arange(m), 3)
    cols = (np.arange(m)[:, None] + np.array([0, 1, 2])[None, :]).ravel()
    vals = np.tile(np.array([1.0, -2.0, 1.0]), m)
    A = sps.csr_matrix((vals, (rows, cols)), shape=(m, n))
    return Q, -d_vec, A, np.zeros(m), np.full(m, np.inf)


def main():
    from run import generate_suite

    suite = "/root/repo/benchmarks/generated_suite"
    generate_suite(suite)

    from qpdo_tpu.native import read_qps_native

    path = os.path.join(suite, "bigliswet50k.qps")
    d = read_qps_native(path, dense=False)
    N = d.Q.shape[0]
    d_fine = -np.asarray(d.q)
    t_fine = np.linspace(0, 1, N)

    levels = [N]
    while levels[0] > 700:
        levels.insert(0, (levels[0] + 1) // 2)
    print(json.dumps({"file": "bigliswet50k.qps", "n": N,
                      "ladder": levels}), flush=True)

    problems = [liswet_from_d(np.interp(np.linspace(0, 1, n),
                                        t_fine, d_fine))
                for n in levels[:-1]]
    # the FINE level uses the ingested data verbatim (ingest is part of
    # the acceptance, not just the ladder construction)
    problems.append((d.Q, d.q, d.A, d.l, d.u))

    def prolong(x, y, i):
        return qt.grid1d_prolong(levels[i], levels[i + 1], order=2)(x, y)

    settings = qt.Settings(eps_abs=1e-6, max_iter=100000,
                           inner_max_iter=100, eps_abs_in=0.1,
                           rho=0.2, delta=1e-4, theta=0.9, mu_min=1e-9)
    if os.environ.get("QPDO_EX_TPU"):
        settings = settings.replace(kkt_dtype="float32", refine_steps=3,
                                    max_time=3600.0,
                                    # with resume armed, in-process
                                    # reattach is futile on this fault
                                    # class — die fast, relaunch fresh
                                    crash_recovery=0 if os.environ.get(
                                        "QPDO_EX_RESUME") else 3)
    else:
        settings = settings.replace(kkt_dtype="float32", refine_steps=3)

    def progress(i, r):
        print(json.dumps({"level": levels[i],
                          "status": int(r.info.status_val),
                          "iters": int(r.info.iterations)}), flush=True)

    t0 = time.time()
    res = qt.solve_continuation(
        problems, settings, prolong=prolong, dtype="float64",
        refine_final=True, progress=progress,
        resume_path=os.environ.get("QPDO_EX_RESUME") or None)
    x, y = np.asarray(res.x), np.asarray(res.y)
    Q, A = d.Q.tocsr(), d.A.tocsr()
    Ax = A @ x
    rp = float(np.max(np.abs(Ax - np.clip(Ax + y, d.l, d.u))))
    rd = float(np.max(np.abs(Q @ x + d.q + A.T @ y)))
    print(json.dumps({"file": "bigliswet50k.qps", "n": N,
                      "status": int(res.info.status_val),
                      "rp": rp, "rd": rd,
                      "wall_s": round(time.time() - t0, 1),
                      "verified": bool(rp <= 1e-6 and rd <= 1e-6)}),
          flush=True)
    assert rp <= 1e-6 and rd <= 1e-6


if __name__ == "__main__":
    main()
