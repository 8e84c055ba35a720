#!/bin/bash
# Warmup-GEMM precision sweep (chained after queue6): the f32 warmup phase
# is ~92% of iterations; its GEMMs run 6-pass "highest" today.  tf32-ish
# (3-pass) and bf16 (1-pass) are ~2x/6x the MXU rate IF the schedule
# tolerates the noise — the bench's oracle decides.
cd /root/repo
Q6PID=$(cat /tmp/tpu_queue6.shpid 2>/dev/null)
while [ -n "$Q6PID" ] && kill -0 "$Q6PID" 2>/dev/null; do sleep 60; done

echo "=== q7 job 0: bench warmup_prec=tensorfloat32 ==="
QPDO_BENCH_WARMUP_PREC=tensorfloat32 timeout 2400 python bench.py > logs/bench_wprec_tf32.log 2>&1
tail -1 logs/bench_wprec_tf32.log

echo "=== q7 job 1: bench warmup_prec=default (bf16 passes) ==="
QPDO_BENCH_WARMUP_PREC=default timeout 2400 python bench.py > logs/bench_wprec_bf16.log 2>&1
tail -1 logs/bench_wprec_bf16.log

echo "=== q7 job 2: bench B=512 (saturation re-check under polish) ==="
QPDO_BENCH_B=512 timeout 2400 python bench.py > logs/bench_b512_polish.log 2>&1
tail -1 logs/bench_b512_polish.log
echo "=== queue7 done $(date +%H:%M:%S) ==="
