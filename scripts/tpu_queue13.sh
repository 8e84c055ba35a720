#!/bin/bash
# Round-3 queue 13 (chained after queue12): the fused-residuals Pallas
# microbenchmark — the last SURVEY §7 step-4 kernel, measured honestly.
cd /root/repo
echo $$ > /tmp/tpu_queue13.shpid
Q12PID=$(cat /tmp/tpu_queue12.shpid 2>/dev/null)
while [ -n "$Q12PID" ] && kill -0 "$Q12PID" 2>/dev/null; do sleep 60; done

echo "=== q13 job 0: fused residuals pallas vs xla ==="
timeout 3600 python scripts/tpu_pallas_residuals_bench.py \
  > logs/pallas_residuals_tpu.log 2>&1
grep -v WARNING logs/pallas_residuals_tpu.log | tail -3

echo "=== queue13 done $(date +%H:%M:%S) ==="
