#!/bin/bash
# Round-5 TPU queue F (chains after r5d): knob sweep on top of the new
# ns5 headline (974.7 QPs/s at B=256 — 1.67x over the direct path).
cd /root/repo
echo $$ > /tmp/tpu_queue_r5f.shpid

prev=$(cat /tmp/tpu_queue_r5d.shpid 2>/dev/null || echo 0)
while kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r5f $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -3
}

NS="env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=5 QPDO_BENCH_NSREFRESH=0 QPDO_BENCH_LIBDEFAULT=0"
run bench_ns5_512_r5f     2700 $NS QPDO_BENCH_B=512 python bench.py
run bench_ns5_presid_r5f  2700 $NS QPDO_BENCH_PALLAS=residuals python bench.py
run bench_ns5_frhs_r5f    2700 $NS QPDO_BENCH_FUSEDRHS=1 python bench.py
run bench_ns5_nopol_r5f   2700 $NS QPDO_BENCH_POLISH=0 python bench.py
run bench_ns4_256_r5f     2700 env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=4 QPDO_BENCH_NSREFRESH=0 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run admm_compare_tpu_r5f  3600 env QPDO_CMP_PLATFORM=axon python benchmarks/run_admm_compare.py

echo "=== queue r5f done $(date +%H:%M:%S) ==="
