#!/bin/bash
# Round-4 TPU queue D — chains after r4c.
#  1. the n=90k LISWET ladder RERUN with the round-4 banded fix
#     (Jacobi equilibration + PCG refinement): the first attempt failed
#     at n>=5625 on the f32 direction-accuracy floor at cond~1/mu_min
#     (root-caused + fixed on CPU: every level's iterations drop and the
#     ladder wall halves — logs/ladder11250_pcgref_cpu_r4.log)
#  2. cold-start direction-quality probe at the previously-failing
#     levels (expect scan == cr trajectories and tail rd ~ 1e-10;
#     cold LISWET at these sizes still MAX_ITERs at cap 3000 by design —
#     the ladder is the convergence path, rd is the signal here)
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

run ladder90k_tpu_r4fix 13200 env QPDO_EX_TPU=1 python examples/continuation.py 90000
run cr5625_tpu_r4       8000 env QPDO_PROBE_PLATFORM=axon QPDO_PROBE_CELLS=cr0 python scripts/cr_stability_probe.py 5625

echo "=== queue r4d done $(date +%H:%M:%S) ==="
