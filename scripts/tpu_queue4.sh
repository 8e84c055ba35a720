#!/bin/bash
# Wait for the axon TPU (long probes: post-crash re-init can exceed 150 s),
# then run queued experiments sequentially (ONE TPU process at a time).
cd /root/repo
probe() { timeout 900 python -c "import jax; jax.devices()" >/dev/null 2>&1; }
for i in $(seq 1 120); do
  if probe; then echo "TPU back after $i probes ($(date +%H:%M:%S))"; break; fi
  echo "probe $i failed $(date +%H:%M:%S)"; sleep 180
done
if ! probe; then echo "TPU never came back"; exit 1; fi

echo "=== job 0: official bench (polish default, best-of-3) ==="
timeout 3500 python bench.py > logs/bench_polish_default.log 2>&1
tail -1 logs/bench_polish_default.log

echo "=== job 1: ablation bench polish=0 weps=1e-4 (round-2 settings) ==="
QPDO_BENCH_POLISH=0 QPDO_BENCH_WEPS=1e-4 timeout 3500 python bench.py > logs/bench_nopolish.log 2>&1
tail -1 logs/bench_nopolish.log

echo "=== job 2: bench kktrows=16 ==="
QPDO_BENCH_KKTROWS=16 timeout 3500 python bench.py > logs/bench_kktrows16.log 2>&1
tail -1 logs/bench_kktrows16.log

echo "=== job 3: sparse newton probe ==="
timeout 2400 python scripts/tpu_sparse_newton_probe.py > logs/tpu_sparse_newton_probe.log 2>&1
tail -3 logs/tpu_sparse_newton_probe.log

echo "=== job 4: sparse trajectory f32 CG + f32 precond ==="
timeout 4000 python scripts/cg_traj.py > logs/tpu_cg_traj2.log 2>&1
tail -3 logs/tpu_cg_traj2.log
echo "=== queue done ==="
