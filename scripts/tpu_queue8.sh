#!/bin/bash
# Round-3 TPU measurement queue (healthy chip, 2026-08-19).
# ONE TPU process at a time; each job logs to logs/.
cd /root/repo
echo $$ > /tmp/tpu_queue8.shpid

echo "=== q8 job 0: mm_like banded families on-TPU (QBAND/GOULDQP/CONT) ==="
QPDO_MM_TPU=1 timeout 10800 python benchmarks/mm_like.py \
  --families QBAND,GOULDQP,CONT --max-n 10000 \
  > logs/mm_like_banded_tpu_r3.log 2>&1
tail -1 logs/mm_like_banded_tpu_r3.log

echo "=== q8 job 1: sparse fuzz campaign on-TPU (12 cells) ==="
QPDO_FUZZ_PLATFORM=axon FUZZ_LO=0 FUZZ_HI=12 timeout 10800 \
  python benchmarks/fuzz_sparse.py > logs/fuzz_sparse_tpu_r3.log 2>&1
tail -2 logs/fuzz_sparse_tpu_r3.log

echo "=== q8 job 2: official bench (hardened accounting) ==="
timeout 2400 python bench.py > logs/bench_r3_baseline.log 2>&1
tail -1 logs/bench_r3_baseline.log

echo "=== q8 job 3: bench warmup_prec=tensorfloat32 ==="
QPDO_BENCH_WARMUP_PREC=tensorfloat32 timeout 2400 python bench.py \
  > logs/bench_r3_tf32.log 2>&1
tail -1 logs/bench_r3_tf32.log

echo "=== q8 job 4: bench warmup_prec=default (bf16 passes) ==="
QPDO_BENCH_WARMUP_PREC=default timeout 2400 python bench.py \
  > logs/bench_r3_bf16.log 2>&1
tail -1 logs/bench_r3_bf16.log

echo "=== q8 job 5: bench kkt_update_rows=16 (re-check on healthy chip) ==="
QPDO_BENCH_KKTROWS=16 timeout 2400 python bench.py \
  > logs/bench_r3_kktrows16.log 2>&1
tail -1 logs/bench_r3_kktrows16.log

echo "=== q8 job 6: bench linesearch=bisect_chunk (launch-count cut) ==="
QPDO_BENCH_LINESEARCH=bisect_chunk timeout 2400 python bench.py \
  > logs/bench_r3_lschunk.log 2>&1
tail -1 logs/bench_r3_lschunk.log

echo "=== q8 job 7: bench linesearch=sort (f32 sort re-measure) ==="
QPDO_BENCH_LINESEARCH=sort timeout 2400 python bench.py \
  > logs/bench_r3_lssort.log 2>&1
tail -1 logs/bench_r3_lssort.log

echo "=== queue8 done $(date +%H:%M:%S) ==="
