#!/bin/bash
# Round-5 TPU queue D (chains after r5c: ladder + bigrand):
# Newton-Schulz-tracked-inverse (kkt_solver="ns") bench A/B — the
# fixed-big-op Newton solve the round-5 probe cost model predicts wins.
# CPU iteration counts at the bench batch: ns_steps 3/4/5 ->
# 93/69/55 refreshed, 77/60/48 init-only, vs 57 direct; ns5 BEATS the
# direct path in iterations while each iteration is pure GEMM work.
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

run bench_ns5_256_r5d    2700 env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=5 QPDO_BENCH_NSREFRESH=0 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run bench_ns5_1024_r5d   2700 env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=5 QPDO_BENCH_NSREFRESH=0 QPDO_BENCH_B=1024 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run bench_ns5_4096_r5d   2700 env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=5 QPDO_BENCH_NSREFRESH=0 QPDO_BENCH_B=4096 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run bench_ns5r_1024_r5d  2700 env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=5 QPDO_BENCH_NSREFRESH=1 QPDO_BENCH_B=1024 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run bench_ns3_1024_r5d   2700 env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=3 QPDO_BENCH_NSREFRESH=0 QPDO_BENCH_B=1024 QPDO_BENCH_LIBDEFAULT=0 python bench.py

echo "=== queue r5d done $(date +%H:%M:%S) ==="
