#!/bin/bash
# Round-5 TPU queue B:
#   1. Newton-solve replacement probe (probe2): isolate cholesky vs
#      trisolve cost; measure Newton-Schulz / Gauss-Jordan / CG-loop
#      candidates at the bench shapes;
#   2. the 9-level n=90,000 LISWET ladder through the FIXED
#      crash-recovery restore path (round-4 verdict item 1, restarted
#      after the probe2 insertion);
#   3. BIGRAND n=8000 single retry (verdict item 8 — 6th attempt; if it
#      crashes again the item freezes as platform-ticket evidence).
cd /root/repo
echo $$ > /tmp/tpu_queue_r5b.shpid

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r5b $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run shape_probe2_r5b   3600 python scripts/tpu_shape_probe2.py
run ladder90k_tpu_r5b 14400 env QPDO_EX_TPU=1 python examples/continuation.py 90000
run bigrand_retry_r5b  3600 python scripts/tpu_bigrand_retry.py

echo "=== queue r5b done $(date +%H:%M:%S) ==="
