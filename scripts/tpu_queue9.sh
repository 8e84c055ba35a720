#!/bin/bash
# Round-3 queue 9: ELL matvec before/after timing on the TPU.
# Chained after queue8 (waits on its PID file).  ONE TPU process at a time.
cd /root/repo
echo $$ > /tmp/tpu_queue9.shpid
Q8PID=$(cat /tmp/tpu_queue8.shpid 2>/dev/null)
while [ -n "$Q8PID" ] && kill -0 "$Q8PID" 2>/dev/null; do sleep 60; done

echo "=== q9 job 0: CG size ladder, ELL default (compare r3 pre-ELL: 189/359/209 s) ==="
timeout 7200 python scripts/tpu_cg_size_probe.py \
  > logs/tpu_cg_size_probe_ell.log 2>&1
grep -v WARNING logs/tpu_cg_size_probe_ell.log | tail -4

echo "=== q9 job 1: full n=2000 sparse solve, ELL default (compare 240 s pre-ELL) ==="
timeout 3600 python scripts/cg_traj.py > logs/tpu_cg_traj_ell.log 2>&1
grep -v WARNING logs/tpu_cg_traj_ell.log | tail -2

echo "=== queue9 done $(date +%H:%M:%S) ==="
