#!/bin/bash
# Patient TPU-availability probe: try a tiny axon init+op every 90 s until it
# succeeds (stale server-side grants clear in ~5-10 min). Each attempt gets a
# generous internal timeout; success writes TPU_OK to the log and stops.
LOG=/tmp/tpu_probe.log
: > "$LOG"
for i in $(seq 1 40); do
  echo "--- attempt $i $(date +%H:%M:%S)" >> "$LOG"
  timeout 240 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones(8) + 1
x.block_until_ready()
print('TPU_OK', d)
" >> "$LOG" 2>&1
  if grep -q TPU_OK "$LOG"; then
    echo "TPU available after attempt $i" >> "$LOG"
    exit 0
  fi
  sleep 90
done
echo "TPU_NEVER_CAME_BACK" >> "$LOG"
exit 1
