#!/bin/bash
# Round-4 TPU queue A: the verdict's measurement items, highest value
# first so late jobs starving the clock cannot cost the critical rows.
#  1-2. bench A/B baseline + both-Pallas-kernels (verdict item 2)
#  3.   BIGRAND n=8000 retry through crash-resilient segmentation (item 3)
#  4.   CR level-704 on-TPU with the accuracy-gated fallback (item 1)
#  5-6. bench A/B formation-only / residuals-only cells (item 2)
#  7.   n=90k LISWET ladder with adaptive host-chunking (item 4)
#  8.   mm_like banded families regression under the CR gate (item 1)
cd /root/repo
echo $$ > /tmp/tpu_queue_r4a.shpid

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r4a $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run bench_r4_base             2700 python bench.py
run bigrand_retry_tpu_r4      6000 python scripts/tpu_bigrand_retry.py
run cr704_tpu_r4              6000 env QPDO_PROBE_CELLS=scan,cr0 python scripts/cr_stability_probe.py 704
run bench_r4_pallas_both      2700 env QPDO_BENCH_PALLAS=both python bench.py
run bench_r4_pallas_formation 2700 env QPDO_BENCH_PALLAS=formation python bench.py
run bench_r4_pallas_residuals 2700 env QPDO_BENCH_PALLAS=residuals python bench.py
run ladder90k_tpu_r4         13200 env QPDO_EX_TPU=1 python examples/continuation.py 90000
run mm_like_banded_tpu_r4     6000 env QPDO_MM_TPU=1 python benchmarks/mm_like.py --families QBAND,GOULDQP,CONT --max-n 10000

echo "=== queue r4a done $(date +%H:%M:%S) ==="
