#!/bin/bash
# Round-5 TPU queue H (chains after r5e): final confirmation of the
# shipped bench defaults (the exact invocation the driver uses) plus
# the remaining cheap knob cells on top of the 1596 QPs/s config.
cd /root/repo
echo $$ > /tmp/tpu_queue_r5h.shpid

prev=$(cat /tmp/tpu_queue_r5e.shpid 2>/dev/null || echo 0)
while kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r5h $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -3
}

run bench_default_r5h   2700 python bench.py
run bench_weps3e5_r5h   2700 env QPDO_BENCH_WEPS=3e-5 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run bench_ns6_r5h       2700 env QPDO_BENCH_NSSTEPS=6 QPDO_BENCH_LIBDEFAULT=0 python bench.py
run bench_B128_r5h      2700 env QPDO_BENCH_B=128 QPDO_BENCH_LIBDEFAULT=0 python bench.py

echo "=== queue r5h done $(date +%H:%M:%S) ==="
