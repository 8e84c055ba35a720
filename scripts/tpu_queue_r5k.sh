#!/bin/bash
# Round-5 TPU queue K (chains after r5j): final alternating attempts at
# the two remaining big-ladder levels (90k ladder at level 45000; 50k
# ladder at level 50000) with a HARD 23:10 cutoff so the chip is free
# for the end-of-round driver bench.  Every attempt is a fresh process
# resuming from the banked checkpoints; the platform's ~9-minute
# worker MTBF today is the only opponent left.
cd /root/repo
echo $$ > /tmp/tpu_queue_r5k.shpid

prev=$(cat /tmp/tpu_queue_r5j.shpid 2>/dev/null || echo 0)
while kill -0 "$prev" 2>/dev/null; do sleep 30; done

deadline=$(date -d "23:10" +%s 2>/dev/null || echo 0)

for t in $(seq 1 12); do
  [ "$(date +%s)" -ge "$deadline" ] && { echo "=== r5k deadline reached ==="; break; }
  if ! grep -q "final KKT" logs/ladder90k_tpu_r5i.log logs/ladder90k_tpu_r5k.log 2>/dev/null; then
    echo "=== r5k ladder90k try $t start $(date +%H:%M:%S) ==="
    timeout 5400 env QPDO_EX_RESUME=/tmp/ladder90k_r5e.npz \
      QPDO_CHUNK_TARGET_S=5 QPDO_EX_TPU=1 \
      python examples/continuation.py 90000 >> logs/ladder90k_tpu_r5k.log 2>&1
    echo "--- ladder try $t exit=$? $(date +%H:%M:%S)"
  fi
  [ "$(date +%s)" -ge "$deadline" ] && { echo "=== r5k deadline reached ==="; break; }
  if ! grep -q '"verified": true' logs/liswet50k_qps_tpu_r5j.log logs/liswet50k_qps_tpu_r5k.log 2>/dev/null; then
    echo "=== r5k 50k try $t start $(date +%H:%M:%S) ==="
    timeout 5400 env QPDO_EX_RESUME=/tmp/liswet50k_r5e.npz \
      QPDO_CHUNK_TARGET_S=5 QPDO_EX_TPU=1 \
      python scripts/tpu_liswet_qps_continuation.py >> logs/liswet50k_qps_tpu_r5k.log 2>&1
    echo "--- 50k try $t exit=$? $(date +%H:%M:%S)"
  fi
  if grep -q "final KKT" logs/ladder90k_tpu_r5k.log 2>/dev/null && \
     grep -q '"verified": true' logs/liswet50k_qps_tpu_r5k.log 2>/dev/null; then
    echo "=== both complete ==="; break
  fi
  sleep 90
done

echo "=== queue r5k done $(date +%H:%M:%S) ==="
