#!/bin/bash
# Round-3 queue 10: op-count-cut bench ablations (chained after queue9).
# The q8 sweep proved this chip state is MXU-op-rate-bound (kktrows16 cut
# FLOPs 2.5x at equal wall): throughput ~ 1/(ops/iter).  Warmup
# refinement is 5 of ~13 MXU ops per warmup iteration and measured
# iteration-neutral on the bench family (CPU, B=64: identical 57.38).
cd /root/repo
echo $$ > /tmp/tpu_queue10.shpid
Q9PID=$(cat /tmp/tpu_queue9.shpid 2>/dev/null)
while [ -n "$Q9PID" ] && kill -0 "$Q9PID" 2>/dev/null; do sleep 60; done

echo "=== q10 job 0: bench warmup_refine_steps=0 ==="
QPDO_BENCH_WREFINE=0 timeout 2400 python bench.py \
  > logs/bench_r3_wrefine0.log 2>&1
tail -1 logs/bench_r3_wrefine0.log

echo "=== q10 job 1: bench wrefine=0 + tf32 warmup (compose the wins) ==="
QPDO_BENCH_WREFINE=0 QPDO_BENCH_WARMUP_PREC=tensorfloat32 timeout 2400 \
  python bench.py > logs/bench_r3_wrefine0_tf32.log 2>&1
tail -1 logs/bench_r3_wrefine0_tf32.log

echo "=== queue10 done $(date +%H:%M:%S) ==="
