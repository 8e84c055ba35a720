#!/bin/bash
# Round-4 TPU queue F — chains after r4c.  Batch-size sweep.
#
# The r4b baseline with the FIXED peak probes exposed the real picture:
# the chip peaks at 4.3 TFLOPS f32 (every earlier 0.04-0.09 reading was
# the probe timing a 67 MB host transfer), while the solver achieves
# 0.13 TFLOPS => honest MFU 3% — the iteration is launch/latency-bound
# on this frontend, not MXU-bound.  The direct lever is batch size:
# per-iteration overhead amortizes over B, and HBM fits B >> 256 at the
# bench shape (K is 256x256xf32 padded per problem ~ 0.25 MB).
cd /root/repo
echo $$ > /tmp/tpu_queue_r4f.shpid

prev=$(cat /tmp/tpu_queue_r4c.shpid 2>/dev/null)
while [ -n "$prev" ] && kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r4f $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run bench_r4f_B512  2700 env QPDO_BENCH_B=512  python bench.py
run bench_r4f_B1024 2700 env QPDO_BENCH_B=1024 python bench.py
run bench_r4f_B2048 3600 env QPDO_BENCH_B=2048 python bench.py
run bench_r4f_B4096 3600 env QPDO_BENCH_B=4096 python bench.py

echo "=== queue r4f done $(date +%H:%M:%S) ==="
