#!/bin/bash
# Round-3 queue 9: ELL matvec before/after timing on the TPU.
# Chained after queue8 (waits on its PID file).  ONE TPU process at a time.
cd /root/repo
echo $$ > /tmp/tpu_queue9.shpid
Q8PID=$(cat /tmp/tpu_queue8.shpid 2>/dev/null)
while [ -n "$Q8PID" ] && kill -0 "$Q8PID" 2>/dev/null; do sleep 60; done

echo "=== q9 job 0: CG size ladder, ELL default (compare r3 pre-ELL: 189/359/209 s) ==="
timeout 7200 python scripts/tpu_cg_size_probe.py \
  > logs/tpu_cg_size_probe_ell.log 2>&1
grep -v WARNING logs/tpu_cg_size_probe_ell.log | tail -4

echo "=== q9 job 1: full n=2000 sparse solve, ELL default (compare 240 s pre-ELL) ==="
timeout 3600 python scripts/cg_traj.py > logs/tpu_cg_traj_ell.log 2>&1
grep -v WARNING logs/tpu_cg_traj_ell.log | tail -2

echo "=== q9 job 1b: BIGRAND n=8000 with host-chunked driving (max_time) ==="
timeout 3600 python - > logs/bigrand_chunked_tpu.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import qpdo_tpu as qt
from qpdo_tpu.native import read_qps_native
d = read_qps_native("benchmarks/generated_suite/bigrand.qps", dense=False)
# max_time -> solve_driven -> 32-iteration chunks with host syncs: tests
# the hypothesis that the 2x BIGRAND worker crash is the single giant
# jitted execution, not the workload itself
s = qt.Settings(eps_abs=1e-6, max_iter=5000, inner_max_iter=100,
                eps_abs_in=0.1, rho=0.02, delta=0.1, refine_steps=3,
                kkt_dtype="float32", hybrid_warmup=True, mu_min=1e-7,
                cg_dtype="float32", precond_dtype="float32",
                precond_block=64, max_time=1800.0)
t0 = time.time()
r = qt.solve_sparse(d.Q, d.q, d.A, d.l, d.u, d.c, settings=s)
st = int(np.asarray(r.info.status_val))
x, y = np.asarray(r.x), np.asarray(r.y)
Q, A = d.Q.tocsr(), d.A.tocsr()
Ax = A @ x
rp = float(np.max(np.abs(Ax - np.clip(Ax + y, d.l, d.u))))
rd = float(np.max(np.abs(Q @ x + d.q + A.T @ y)))
print({"file": "bigrand-chunked", "status": st,
       "iters": int(r.info.iterations), "rp": rp, "rd": rd,
       "secs": round(time.time() - t0, 1)}, flush=True)
EOF
tail -1 logs/bigrand_chunked_tpu.log

echo "=== q9 job 2: sparse fuzz on-TPU re-run (12 cells, stamped output) ==="
QPDO_FUZZ_PLATFORM=axon FUZZ_LO=0 FUZZ_HI=12 timeout 10800 \
  python benchmarks/fuzz_sparse.py > logs/fuzz_sparse_tpu_r3b.log 2>&1
grep -v WARNING logs/fuzz_sparse_tpu_r3b.log | tail -3

echo "=== queue9 done $(date +%H:%M:%S) ==="
