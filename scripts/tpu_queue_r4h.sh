#!/bin/bash
# Round-4 TPU queue H — consolidated relaunch after the machine restart
# killed queues r4b(remaining)/r4c/r4d/r4e/r4f/r4g.  Priority order:
# headline levers first (batch-size sweep, fused-KKT Pallas A/B — the
# two levers matched to the corrected-probe finding that the bench
# iteration is launch/latency-bound at honest MFU 3%), then validation
# cells, then the long ladder, then the crash-risk sustained-CG jobs
# LAST so a worker crash cannot cost the earlier results.
cd /root/repo
echo $$ > /tmp/tpu_queue_r4h.shpid

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r4h $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

# --- headline levers ---------------------------------------------------
run bench_r4h_B1024            3600 env QPDO_BENCH_B=1024 python bench.py
run bench_r4h_B2048            3600 env QPDO_BENCH_B=2048 python bench.py
run bench_r4h_B512             2700 env QPDO_BENCH_B=512  python bench.py
run bench_r4h_B4096            4500 env QPDO_BENCH_B=4096 python bench.py
run pallas_repro_tpu_r4        6000 python scripts/pallas_lowering_repro.py
run bench_r4h_pallas_kkt       2700 env QPDO_BENCH_PALLAS=kkt python bench.py
run bench_r4h_pallas_both      2700 env QPDO_BENCH_PALLAS=both python bench.py
run bench_r4h_pallas_all       2700 env QPDO_BENCH_PALLAS=all python bench.py
run bench_r4h_pallas_all_B1024 3600 env QPDO_BENCH_PALLAS=all QPDO_BENCH_B=1024 python bench.py
run bench_r4h_fusedrhs         2700 env QPDO_BENCH_FUSEDRHS=1 python bench.py

# --- validation cells ---------------------------------------------------
run cr704_tpu_r4b       7200 env QPDO_PROBE_PLATFORM=axon QPDO_PROBE_CELLS=scan,cr0 python scripts/cr_stability_probe.py 704
run per_op_profile_tpu_r4 6000 python scripts/tpu_per_op_profile.py
run admm_compare_tpu_r4 6000 env QPDO_CMP_PLATFORM=axon python benchmarks/run_admm_compare.py

# --- long / heavier ------------------------------------------------------
run big_banded_tpu_r4b  8000 python scripts/tpu_big_banded.py
run ladder90k_tpu_r4fix 13200 env QPDO_EX_TPU=1 python examples/continuation.py 90000

# --- crash-risk (sustained sparse CG) LAST -------------------------------
run bigrand_retry_tpu_r4b 6000 python scripts/tpu_bigrand_retry.py

echo "=== queue r4h done $(date +%H:%M:%S) ==="
