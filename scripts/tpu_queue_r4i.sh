#!/bin/bash
# Round-4 TPU queue I — chains after the in-flight ladder90k child
# (r4h's driver script was killed to interpose this queue; the ladder
# python process keeps running and we wait on its exact pid).
#
# 1-5. the Pallas in-loop A/B, re-run with the x64 legalization fix
#      (pallas_util.x32_trace_scope; commit f571220) — the repro matrix
#      G-cells first give a fast compile-only verdict.
# 6.   cr704 cold-start probe, now actually ON the TPU (platform re-pin
#      bug in cr_stability_probe fixed in the same commit)
# 7.   BIGRAND n=8000 retry (crash-risk, strictly last)
cd /root/repo
echo $$ > /tmp/tpu_queue_r4i.shpid

# wait for the ladder90k child (pid recorded at interpose time)
prev=${LADDER_PID:-5243}
while kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r4i $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run pallas_repro_x64_r4i       6000 python scripts/pallas_lowering_repro.py
run bench_r4i_pallas_kkt       2700 env QPDO_BENCH_PALLAS=kkt python bench.py
run bench_r4i_pallas_both      2700 env QPDO_BENCH_PALLAS=both python bench.py
run bench_r4i_pallas_all       2700 env QPDO_BENCH_PALLAS=all python bench.py
run bench_r4i_pallas_residuals 2700 env QPDO_BENCH_PALLAS=residuals python bench.py
run cr704_tpu_r4i              7200 env QPDO_PROBE_PLATFORM=axon QPDO_PROBE_CELLS=scan,cr0 python scripts/cr_stability_probe.py 704
run bigrand_retry_tpu_r4i      6000 python scripts/tpu_bigrand_retry.py

echo "=== queue r4i done $(date +%H:%M:%S) ==="
