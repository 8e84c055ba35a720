#!/bin/bash
# Round-3 queue 12 (chained after queue11): the full mm_like suite
# on-TPU at sizes <= 1024 — every family (not just the banded three),
# TPU-safe precision, per-instance JSON lines so a timeout keeps partial
# evidence.  n <= 1024 stays far from the n=8000 crash class.
cd /root/repo
echo $$ > /tmp/tpu_queue12.shpid
Q11PID=$(cat /tmp/tpu_queue11.shpid 2>/dev/null)
while [ -n "$Q11PID" ] && kill -0 "$Q11PID" 2>/dev/null; do sleep 60; done

echo "=== q12 job 0: mm_like FULL suite on-TPU, max-n 1024 ==="
QPDO_MM_TPU=1 timeout 14400 python benchmarks/mm_like.py --max-n 1024 \
  > logs/mm_like_full_tpu_r3.log 2>&1
grep -v WARNING logs/mm_like_full_tpu_r3.log | tail -2

echo "=== queue12 done $(date +%H:%M:%S) ==="
