#!/bin/bash
# Round-4 queue L — chains after the ladder90k r4k rerun (pid via env).
#
# 1. bigqband20k re-run: regression check of the n=20,000 banded QPS
#    solve now that every banded program carries the state-dtype
#    escalation branch (gate should PASS throughout at mu_min=1e-7 —
#    expect runtime parity with the 195.3 s pre-escalation baseline
#    modulo chip state).
cd /root/repo
echo $$ > /tmp/tpu_queue_r4l.shpid

prev=${LADDER_PID:-16340}
while kill -0 "$prev" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== r4l $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S); tail:"
  grep -v -e WARNING -e "^#" "logs/${name}.log" | tail -3
}

run bigband20k_esc_r4l 2700 env QPDO_BB_FILES=bigqband20k.qps python scripts/tpu_big_banded.py

echo "=== queue r4l done $(date +%H:%M:%S) ==="
