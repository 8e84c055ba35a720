#!/bin/bash
# Round-5 TPU queue J (chains after r5i): continuation of the
# QPS-ingested n=50,000 LISWET ladder (resume-preserving, gentler
# device executions).  No-op if already complete.
cd /root/repo
echo $$ > /tmp/tpu_queue_r5j.shpid

prev=$(cat /tmp/tpu_queue_r5i.shpid 2>/dev/null || echo 0)
while kill -0 "$prev" 2>/dev/null; do sleep 30; done

for t in $(seq 1 4); do
  if grep -q '"verified": true' logs/liswet50k_qps_tpu_r5e.log 2>/dev/null || \
     grep -q '"verified": true' logs/liswet50k_qps_tpu_r5j.log 2>/dev/null; then
    echo "=== 50k already complete; skipping ==="
    break
  fi
  echo "=== r5j 50k continuation try $t/4 start $(date +%H:%M:%S) ==="
  timeout 7200 env QPDO_EX_RESUME=/tmp/liswet50k_r5e.npz \
    QPDO_CHUNK_TARGET_S=5 QPDO_EX_TPU=1 \
    python scripts/tpu_liswet_qps_continuation.py >> logs/liswet50k_qps_tpu_r5j.log 2>&1
  rc=$?
  echo "--- try $t exit=$rc $(date +%H:%M:%S)"
  [ "$rc" -eq 0 ] && break
  sleep 120
done
grep -v -e WARNING -e "^#" logs/liswet50k_qps_tpu_r5j.log 2>/dev/null | tail -3

echo "=== queue r5j done $(date +%H:%M:%S) ==="
