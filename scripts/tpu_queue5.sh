#!/bin/bash
# Follow-up TPU jobs: wait for queue4 (pid file) to finish, then run.
cd /root/repo
Q4PID=$(cat /tmp/tpu_queue4.pid 2>/dev/null)
while [ -n "$Q4PID" ] && kill -0 "$Q4PID" 2>/dev/null; do sleep 120; done

probe() { timeout 900 python -c "import jax; jax.devices()" >/dev/null 2>&1; }
if ! probe; then echo "TPU not available for queue5"; exit 1; fi

echo "=== q5 job 0: bench warmup_prec=tensorfloat32 ==="
QPDO_BENCH_WARMUP_PREC=tensorfloat32 timeout 3500 python bench.py > logs/bench_wprec_tf32.log 2>&1
tail -1 logs/bench_wprec_tf32.log

echo "=== q5 job 1: bench warmup_prec=default (bf16 passes) ==="
QPDO_BENCH_WARMUP_PREC=default timeout 3500 python bench.py > logs/bench_wprec_bf16.log 2>&1
tail -1 logs/bench_wprec_bf16.log

echo "=== q5 job 2: bench B=512 polish ==="
QPDO_BENCH_B=512 timeout 3500 python bench.py > logs/bench_b512_polish.log 2>&1
tail -1 logs/bench_b512_polish.log
echo "=== queue5 done ==="
