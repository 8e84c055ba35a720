#!/bin/bash
# Round-3 TPU measurement queue (healthy chip, 2026-08-19).
# ONE TPU process at a time; each job logs to logs/.
cd /root/repo
echo $$ > /tmp/tpu_queue8.shpid

echo "=== q8 job 0: mm_like banded families on-TPU (QBAND/GOULDQP/CONT) ==="
QPDO_MM_TPU=1 timeout 10800 python benchmarks/mm_like.py \
  --families QBAND,GOULDQP,CONT --max-n 10000 \
  > logs/mm_like_banded_tpu_r3.log 2>&1
tail -1 logs/mm_like_banded_tpu_r3.log

echo "=== q8 job 1: sparse fuzz campaign on-TPU (12 cells) ==="
QPDO_FUZZ_PLATFORM=axon FUZZ_LO=0 FUZZ_HI=12 timeout 10800 \
  python benchmarks/fuzz_sparse.py > logs/fuzz_sparse_tpu_r3.log 2>&1
tail -2 logs/fuzz_sparse_tpu_r3.log

echo "=== q8 job 2: official bench (hardened accounting) ==="
timeout 2400 python bench.py > logs/bench_r3_baseline.log 2>&1
tail -1 logs/bench_r3_baseline.log

echo "=== q8 job 3: bench warmup_prec=tensorfloat32 ==="
QPDO_BENCH_WARMUP_PREC=tensorfloat32 timeout 2400 python bench.py \
  > logs/bench_r3_tf32.log 2>&1
tail -1 logs/bench_r3_tf32.log

echo "=== q8 job 4: bench warmup_prec=default (bf16 passes) ==="
QPDO_BENCH_WARMUP_PREC=default timeout 2400 python bench.py \
  > logs/bench_r3_bf16.log 2>&1
tail -1 logs/bench_r3_bf16.log

echo "=== q8 job 5: bench kkt_update_rows=16 (re-check on healthy chip) ==="
QPDO_BENCH_KKTROWS=16 timeout 2400 python bench.py \
  > logs/bench_r3_kktrows16.log 2>&1
tail -1 logs/bench_r3_kktrows16.log

echo "=== q8 job 6: bench linesearch=bisect_chunk (launch-count cut) ==="
QPDO_BENCH_LINESEARCH=bisect_chunk timeout 2400 python bench.py \
  > logs/bench_r3_lschunk.log 2>&1
tail -1 logs/bench_r3_lschunk.log

echo "=== q8 job 7: bench linesearch=sort (f32 sort re-measure) ==="
QPDO_BENCH_LINESEARCH=sort timeout 2400 python bench.py \
  > logs/bench_r3_lssort.log 2>&1
tail -1 logs/bench_r3_lssort.log

echo "=== q8 job 8 (LAST - crash risk): full BIGRAND n=8000 sparse solve ==="
timeout 3600 python - > logs/bigrand_tpu_r3.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import qpdo_tpu as qt
from qpdo_tpu.native import read_qps_native
d = read_qps_native("benchmarks/generated_suite/bigrand.qps", dense=False)
s = qt.Settings(eps_abs=1e-6, max_iter=5000, inner_max_iter=100,
                eps_abs_in=0.1, rho=0.02, delta=0.1, refine_steps=3,
                kkt_dtype="float32", hybrid_warmup=True, mu_min=1e-7,
                cg_dtype="float32", precond_dtype="float32",
                precond_block=64)
t0 = time.time()
r = qt.solve_sparse(d.Q, d.q, d.A, d.l, d.u, d.c, settings=s)
st = int(np.asarray(r.info.status_val))
x, y = np.asarray(r.x), np.asarray(r.y)
Q, A = d.Q.tocsr(), d.A.tocsr()
Ax = A @ x
rp = float(np.max(np.abs(Ax - np.clip(Ax + y, d.l, d.u))))
rd = float(np.max(np.abs(Q @ x + d.q + A.T @ y)))
print({"file": "bigrand", "status": st, "iters": int(r.info.iterations),
       "rp": rp, "rd": rd, "secs": round(time.time() - t0, 1)}, flush=True)
EOF
tail -1 logs/bigrand_tpu_r3.log

echo "=== queue8 done $(date +%H:%M:%S) ==="
