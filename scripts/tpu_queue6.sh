#!/bin/bash
# Round-2-final TPU measurement queue (chip recovered 2026-08-19).
# ONE TPU process at a time; each job logs to logs/.
cd /root/repo
echo $$ > /tmp/tpu_queue6.shpid   # queue7's chaining guard reads this

echo "=== q6 job 0: official bench, polish default, hardened MFU ==="
timeout 2400 python bench.py > logs/bench_polish_mfufix.log 2>&1
tail -1 logs/bench_polish_mfufix.log

echo "=== q6 job 1: ablation polish=0 weps=1e-4 ==="
QPDO_BENCH_POLISH=0 QPDO_BENCH_WEPS=1e-4 timeout 2400 python bench.py > logs/bench_nopolish.log 2>&1
tail -1 logs/bench_nopolish.log

echo "=== q6 job 2: bench kktrows=16 ==="
QPDO_BENCH_KKTROWS=16 timeout 2400 python bench.py > logs/bench_kktrows16.log 2>&1
tail -1 logs/bench_kktrows16.log

echo "=== q6 job 3: sparse newton probe ==="
timeout 2400 python scripts/tpu_sparse_newton_probe.py > logs/tpu_sparse_newton_probe.log 2>&1
tail -3 logs/tpu_sparse_newton_probe.log

echo "=== q6 job 4: sparse trajectory f32 CG + f32 precond ==="
timeout 2400 python scripts/cg_traj.py > logs/tpu_cg_traj2.log 2>&1
tail -3 logs/tpu_cg_traj2.log
echo "=== queue6 done $(date +%H:%M:%S) ==="
