#!/bin/bash
# Round-4 TPU queue E — chains after r4d.
#  1. qpdo vs the OSQP-class ADMM baseline ON the TPU (the reference
#     paper's comparison class, same chip, same f32 arithmetic, same
#     eps=1e-4 target; CPU f64 rows already recorded at eps=1e-6)
cd /root/repo
echo $$ > /tmp/tpu_queue_r4e.shpid

prev=$(cat /tmp/tpu_queue_r4d.shpid 2>/dev/null)
while [ -n "$prev" ] && kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r4e $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run admm_compare_tpu_r4 6000 env QPDO_CMP_PLATFORM=axon python benchmarks/run_admm_compare.py

echo "=== queue r4e done $(date +%H:%M:%S) ==="
