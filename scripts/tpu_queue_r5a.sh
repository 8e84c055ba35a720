#!/bin/bash
# Round-5 TPU queue A:
#   1. tile-shape probe (the round-4 verdict's untried throughput lever):
#      chained GEMM/Cholesky/iteration rates at MXU-aligned candidate
#      shapes vs the bench shape;
#   2. bench.py baseline re-run (today's chip state; now records the
#      library-default row and the one-denominator MFU story);
#   3. bench.py with inert MXU padding 128x152 — the first shape-change
#      attempt on the measured 50x tile penalty;
#   4. the 9-level n=90,000 LISWET ladder ON the TPU through the FIXED
#      crash-recovery restore path (round-4 verdict item 1).
cd /root/repo
echo $$ > /tmp/tpu_queue_r5a.shpid

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r5a $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run shape_probe_r5a    2700 python scripts/tpu_shape_probe.py
run bench_base_r5a     2700 python bench.py
run bench_pad128_r5a   2700 env QPDO_BENCH_PAD=128x152 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run ladder90k_tpu_r5a 14400 env QPDO_EX_TPU=1 python examples/continuation.py 90000

echo "=== queue r5a done $(date +%H:%M:%S) ==="
