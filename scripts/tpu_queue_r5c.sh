#!/bin/bash
# Round-5 TPU queue C (final order; no further preemption):
#   1. factorization-free dense Newton (kkt_solver="cg") bench A/B at
#      B=256 and B=1024 — probe2 showed the batched Cholesky/trisolve
#      path is ~5 of the 5.3 ms iteration while the GEMM+matvec
#      candidate iteration runs at 1.7 ms (B=256) / 0.83 ms-per-256
#      (B=1024);
#   2. the 9-level n=90,000 LISWET ladder through the FIXED
#      crash-recovery restore path (round-4 verdict item 1);
#   3. BIGRAND n=8000 single retry (verdict item 8, 6th and final).
cd /root/repo
echo $$ > /tmp/tpu_queue_r5c.shpid

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r5c $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run bench_cg256_r5c   2700 env QPDO_BENCH_KKTSOLVER=cg QPDO_BENCH_LIBDEFAULT=0 python bench.py
run bench_cg1024_r5c  2700 env QPDO_BENCH_KKTSOLVER=cg QPDO_BENCH_B=1024 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run ladder90k_tpu_r5c 14400 env QPDO_EX_TPU=1 python examples/continuation.py 90000
run bigrand_retry_r5c  3600 python scripts/tpu_bigrand_retry.py

echo "=== queue r5c done $(date +%H:%M:%S) ==="
