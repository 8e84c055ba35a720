#!/bin/bash
# Round-4 TPU queue G — chains after r4f.  The fused-KKT kernel A/B:
# Settings.pallas_kkt runs the whole Newton solve (formation + Jacobi
# scaling + Cholesky + substitutions) as ONE Pallas launch — the
# launch-count cut matched to the corrected-probe finding that the bench
# iteration is latency-bound (honest MFU 3% on a 4.3 TFLOPS chip).
# Cells: kkt alone, kkt+residuals ("all"), and "all" at B=1024 (the two
# levers compound: fewer launches x better amortization).
cd /root/repo
echo $$ > /tmp/tpu_queue_r4g.shpid

prev=$(cat /tmp/tpu_queue_r4f.shpid 2>/dev/null)
while [ -n "$prev" ] && kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r4g $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run bench_r4g_both      2700 env QPDO_BENCH_PALLAS=both python bench.py
run bench_r4g_kkt       2700 env QPDO_BENCH_PALLAS=kkt python bench.py
run bench_r4g_all       2700 env QPDO_BENCH_PALLAS=all python bench.py
run bench_r4g_all_B1024 3600 env QPDO_BENCH_PALLAS=all QPDO_BENCH_B=1024 python bench.py

echo "=== queue r4g done $(date +%H:%M:%S) ==="
