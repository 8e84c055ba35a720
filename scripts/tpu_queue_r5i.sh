#!/bin/bash
# Round-5 TPU queue I (chains after r5h): CONTINUATION of the n=90k
# ladder — reuses the persistent resume file (levels completed so far
# stay completed), with a gentler device-execution target for the
# sick-chip day (QPDO_CHUNK_TARGET_S=5) and more retries.  No-op if the
# ladder already finished (the resume file then holds the final level
# and the run re-solves it warm in ~1 iteration).
cd /root/repo
echo $$ > /tmp/tpu_queue_r5i.shpid

prev=$(cat /tmp/tpu_queue_r5h.shpid 2>/dev/null || echo 0)
while kill -0 "$prev" 2>/dev/null; do sleep 30; done

for t in $(seq 1 6); do
  if grep -q "final KKT" logs/ladder90k_tpu_r5e.log 2>/dev/null || \
     grep -q "final KKT" logs/ladder90k_tpu_r5i.log 2>/dev/null; then
    echo "=== ladder already complete; skipping ==="
    break
  fi
  echo "=== r5i ladder continuation try $t/6 start $(date +%H:%M:%S) ==="
  timeout 7200 env QPDO_EX_RESUME=/tmp/ladder90k_r5e.npz \
    QPDO_CHUNK_TARGET_S=5 QPDO_EX_TPU=1 \
    python examples/continuation.py 90000 >> logs/ladder90k_tpu_r5i.log 2>&1
  rc=$?
  echo "--- try $t exit=$rc $(date +%H:%M:%S)"
  [ "$rc" -eq 0 ] && break
  sleep 120
done
grep -v -e WARNING -e "^#" logs/ladder90k_tpu_r5i.log 2>/dev/null | tail -4

echo "=== queue r5i done $(date +%H:%M:%S) ==="
