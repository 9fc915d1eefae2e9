#!/bin/bash
# Patient TPU-availability probe. A killed client renews the server-side
# grant (~6 min TTL), so probe SLOWLY: one 9-min attempt, then a 20-min
# quiet gap — guaranteeing a clean window once the terminal recovers.
LOG=/tmp/tpu_probe.log
: > "$LOG"
for i in $(seq 1 20); do
  echo "--- attempt $i $(date +%H:%M:%S)" >> "$LOG"
  timeout 540 python -u -c "
import jax, jax.numpy as jnp
d = jax.devices()
x = (jnp.ones(8) + 1).block_until_ready()
print('TPU_OK', d, flush=True)
" >> "$LOG" 2>&1
  if grep -q TPU_OK "$LOG"; then
    echo "TPU available after attempt $i $(date +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
  sleep 1200
done
echo "TPU_NEVER_CAME_BACK" >> "$LOG"
exit 1
