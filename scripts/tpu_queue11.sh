#!/bin/bash
# Round-3 queue 11: the clean maros-on-TPU completion run (chained after
# queue10).  One-bucket dense padding = one compile; sparse jobs capped at
# n=6000 on this worker (the n=8000 class crashes it — RESULTS.md).
cd /root/repo
echo $$ > /tmp/tpu_queue11.shpid
Q10PID=$(cat /tmp/tpu_queue10.shpid 2>/dev/null)
while [ -n "$Q10PID" ] && kill -0 "$Q10PID" 2>/dev/null; do sleep 60; done

echo "=== q11 job 0: maros acceptance config on-TPU, one bucket ==="
QPDO_MM_ONE_BUCKET=1 timeout 10800 python -c "
import sys; sys.path.insert(0, 'benchmarks')
from run import main
main(['maros'])
" > logs/maros_tpu_r3b.log 2>&1
grep -v WARNING logs/maros_tpu_r3b.log | tail -3

echo "=== queue11 done $(date +%H:%M:%S) ==="
