#!/bin/bash
# Round-4 TPU queue C — chains after r4b.
#  1. per-op MXU wall profile at the bench shape (verdict item 6's
#     "committed per-op profile" deliverable).  The combined op-cut cell
#     (fused_newton_rhs + automatic QAmv2) is already r4b's fusedrhs row.
cd /root/repo
echo $$ > /tmp/tpu_queue_r4c.shpid

prev=$(cat /tmp/tpu_queue_r4b.shpid 2>/dev/null)
while [ -n "$prev" ] && kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r4c $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -4
}

run pallas_repro_tpu_r4   6000 python scripts/pallas_lowering_repro.py
run per_op_profile_tpu_r4 6000 python scripts/tpu_per_op_profile.py

echo "=== queue r4c done $(date +%H:%M:%S) ==="
