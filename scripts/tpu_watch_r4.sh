#!/bin/bash
# Round-4 tunnel watcher: poll the axon TPU tunnel; when it comes back,
# run the prepared probe batch then the full bench, logging everything.
# Usage: bash scripts/tpu_watch_r4.sh >> /tmp/r4_tpu.log 2>&1
cd /root/repo
LOG=/tmp/r4_tpu.log
echo "=== tpu_watch_r4 start $(date -u +%FT%TZ) ==="
for attempt in $(seq 1 40); do
  echo "--- attempt $attempt $(date -u +%FT%TZ): probing tunnel ---"
  if timeout 900 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'axon', jax.default_backend()
x = jnp.ones((128, 128)); float((x @ x).sum())
print('TUNNEL_UP', jax.devices())
"; then
    echo "--- tunnel up; running probe_r3b $(date -u +%FT%TZ) ---"
    timeout 3600 python scripts/probe_r3b.py
    echo "--- probe_r3b done rc=$?; running bench.py $(date -u +%FT%TZ) ---"
    timeout 5400 python bench.py
    echo "--- bench done rc=$? $(date -u +%FT%TZ) ---"
    exit 0
  fi
  echo "--- tunnel still down $(date -u +%FT%TZ); sleeping 600s ---"
  sleep 600
done
echo "=== gave up after 40 attempts $(date -u +%FT%TZ) ==="
exit 1
