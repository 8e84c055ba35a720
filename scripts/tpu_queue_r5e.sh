#!/bin/bash
# Round-5 TPU queue E (chains after r5g):
#   1. the 9-level n=90,000 ladder with PROCESS-LEVEL resume: the r5c
#      attempt proved the axon fault class can leave the in-process
#      client unable to reattach (8 restore backoffs failed while fresh
#      subprocess probes passed), so recovery is an OUTER retry loop —
#      each relaunch is a fresh process resuming from the last
#      completed level (QPDO_EX_RESUME + solve_continuation
#      resume_path);
#   2. QPS-ingested n=50,000 LISWET through the continuation driver
#      (CPU-verified 171 s; fine level oracle-checked against the
#      parsed data);
#   3. BIGQBAND35K n=35,000 banded one-shot.
cd /root/repo
echo $$ > /tmp/tpu_queue_r5e.shpid

prev=$(cat /tmp/tpu_queue_r5g.shpid 2>/dev/null || echo 0)
while kill -0 "$prev" 2>/dev/null; do sleep 30; done

run_retry() {
  local name=$1 tmo=$2 tries=$3 resume=$4; shift 4
  rm -f "$resume"
  for t in $(seq 1 "$tries"); do
    echo "=== r5e $name try $t/$tries start $(date +%H:%M:%S) ==="
    timeout "$tmo" env QPDO_EX_RESUME="$resume" "$@" \
      >> "logs/${name}.log" 2>&1
    rc=$?
    echo "--- $name try $t exit=$rc $(date +%H:%M:%S)"
    [ "$rc" -eq 0 ] && break
    sleep 60  # give a crashed worker a minute before the fresh process
  done
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r5e $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -3
}

rm -f logs/ladder90k_tpu_r5e.log logs/liswet50k_qps_tpu_r5e.log
run_retry ladder90k_tpu_r5e 10800 4 /tmp/ladder90k_r5e.npz \
  env QPDO_EX_TPU=1 python examples/continuation.py 90000
run_retry liswet50k_qps_tpu_r5e 7200 3 /tmp/liswet50k_r5e.npz \
  env QPDO_EX_TPU=1 python scripts/tpu_liswet_qps_continuation.py
run bigqband35k_r5e 5400 env QPDO_BB_FILES=bigqband35k.qps python scripts/tpu_big_banded.py

echo "=== queue r5e done $(date +%H:%M:%S) ==="
