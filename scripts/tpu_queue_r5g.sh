#!/bin/bash
# Round-5 TPU queue G (chains after r5f): polish-off won (1168.5 vs
# 974.7 QPs/s — the batched saddle LU was the post-ns bottleneck);
# tune the warmup depth for the polish-free two-phase split.
cd /root/repo
echo $$ > /tmp/tpu_queue_r5g.shpid

prev=$(cat /tmp/tpu_queue_r5f.shpid 2>/dev/null || echo 0)
while kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r5g $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -3
}

NS="env QPDO_BENCH_KKTSOLVER=ns QPDO_BENCH_NSSTEPS=5 QPDO_BENCH_NSREFRESH=0 QPDO_BENCH_POLISH=0 QPDO_BENCH_LIBDEFAULT=0"
run bench_ns5np_weps1e4_r5g 2700 $NS QPDO_BENCH_WEPS=1e-4 python bench.py
run bench_ns5np_weps3e4_r5g 2700 $NS QPDO_BENCH_WEPS=3e-4 python bench.py
run bench_ns5np_512_r5g     2700 $NS QPDO_BENCH_B=512 python bench.py

echo "=== queue r5g done $(date +%H:%M:%S) ==="
