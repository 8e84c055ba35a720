#!/bin/bash
# Round-4 TPU queue B — chains after r4a (waits on its pid file).
#  1.   fresh bench baseline (the Qmv2 stacked Q-matvec pair landed after
#       r4a's 585.5 baseline, so every A/B below needs a new comparator)
#  2-4. bench Pallas A/B cells, re-run with the custom_vmap batch-collapse
#       fix (r4a cells all died in Mosaic legalization under vmap)
#  5.   bench fused-newton-rhs A/B (verdict item 6 op-count cut)
#  5.   CR level-704 cold-start probe ON TPU (r4a ran it on CPU by
#       default; QPDO_PROBE_PLATFORM was never set)
#  6.   BIGRAND n=8000 retry (script-level setup retry added after the
#       r4a attempt died in the initial device-put)
#  7.   reference-top-end banded n=12k/20k QPS instances on-device
cd /root/repo
echo $$ > /tmp/tpu_queue_r4b.shpid

prev=$(cat /tmp/tpu_queue_r4a.shpid 2>/dev/null)
while [ -n "$prev" ] && kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r4b $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run bench_r4b_base             2700 python bench.py
run bench_r4b_pallas_both      2700 env QPDO_BENCH_PALLAS=both python bench.py
run bench_r4b_pallas_formation 2700 env QPDO_BENCH_PALLAS=formation python bench.py
run bench_r4b_pallas_residuals 2700 env QPDO_BENCH_PALLAS=residuals python bench.py
run bench_r4b_fusedrhs         2700 env QPDO_BENCH_FUSEDRHS=1 python bench.py
run cr704_tpu_r4b              7200 env QPDO_PROBE_PLATFORM=axon QPDO_PROBE_CELLS=scan,cr0 python scripts/cr_stability_probe.py 704
run bigrand_retry_tpu_r4b      6000 python scripts/tpu_bigrand_retry.py
run big_banded_tpu_r4b         8000 python scripts/tpu_big_banded.py

echo "=== queue r4b done $(date +%H:%M:%S) ==="
