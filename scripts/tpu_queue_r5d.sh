#!/bin/bash
# Round-5 TPU queue D (chains after r5c: ladder + bigrand):
# Newton-Schulz-tracked-inverse (kkt_solver="ns") bench A/B — the
# fixed-big-op Newton solve the round-5 probe cost model predicts wins
# (launch-latency-dominated chip: ~5 GEMMs + 3 GEMVs per iteration vs
# the 0.02-TFLOPS lax.linalg factorization path).  B sweep: NS GEMM
# rates scale strongly with batch (0.6 -> 4.4 TFLOPS from B=256 to
# B=1024 at n=100/128).
cd /root/repo
echo $$ > /tmp/tpu_queue_r5d.shpid

prev=$(cat /tmp/tpu_queue_r5c.shpid 2>/dev/null || echo 0)
while kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r5d $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -3
}

run bench_ns256_r5d   2700 env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=3 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run bench_ns1024_r5d  2700 env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=3 QPDO_BENCH_B=1024 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run bench_ns4096_r5d  2700 env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=3 QPDO_BENCH_B=4096 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run bench_ns2_256_r5d 2700 env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=2 QPDO_BENCH_LIBDEFAULT=0 python bench.py

echo "=== queue r5d done $(date +%H:%M:%S) ==="
