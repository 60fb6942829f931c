#!/bin/bash
# Wait for the TPU relay to answer (watcher writes "UP at" and exits),
# then run measurement stage 1 (sorter phase probe) only.
while ! grep -q "^UP at" /tmp/tpu_watch.log; do
  if ! kill -0 3709 2>/dev/null; then
    # watcher died without success: probe ourselves (nothing else running)
    if timeout 300 python -c "import jax; print('TPU UP:', jax.devices())" >> /tmp/tpu_watch.log 2>&1; then
      echo "UP at $(date +%H:%M:%S)" >> /tmp/tpu_watch.log
      break
    fi
    echo "down $(date +%H:%M:%S) (fallback probe)" >> /tmp/tpu_watch.log
  fi
  sleep 60
done
cd /root/repo
echo "=== stage 1: probe_bitonic $(date +%H:%M:%S) ==="
timeout 3000 python scripts/probe_bitonic.py 2> scripts/r3_logs/probe_bitonic.log
echo "=== stage 1 exit=$? $(date +%H:%M:%S) ==="
