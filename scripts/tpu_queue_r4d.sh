#!/bin/bash
# Round-4 TPU queue D — chains after r4c.  Diagnosis of the on-TPU-only
# ladder failures at n>=5625 (MAX_ITER at 5625, NON_CVX at 11250; the
# SAME levels pass on CPU with identical settings INCLUDING the chunked
# driving — logs/ladder11250_cr_chunked_cpu_r4.log).  Cold-start solves
# at the failing levels isolate factorization algo (scan vs cr+gate)
# from the ladder warm-start on the device.
cd /root/repo
echo $$ > /tmp/tpu_queue_r4d.shpid

prev=$(cat /tmp/tpu_queue_r4c.shpid 2>/dev/null)
while [ -n "$prev" ] && kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r4d $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run cr5625_tpu_r4 10000 env QPDO_PROBE_PLATFORM=axon QPDO_PROBE_CELLS=scan,cr0 python scripts/cr_stability_probe.py 5625 11250

echo "=== queue r4d done $(date +%H:%M:%S) ==="
