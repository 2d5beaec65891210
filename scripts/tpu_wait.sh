#!/bin/bash
# Poll for axon TPU availability: the chip comes from a shared pool and a
# claim can queue for tens of minutes (or return UNAVAILABLE).  Each attempt
# needs a fresh process (backend registration is a process-level OnceLock).
for i in $(seq 1 200); do
  echo "[$(date +%H:%M:%S)] attempt $i"
  if timeout 1200 python -c "
import jax, time
t0 = time.time()
d = jax.devices()
print(f'attached in {time.time()-t0:.1f}s: {d}')
import jax.numpy as jnp
x = jnp.arange(8).sum(); x.block_until_ready()
print(f'first op done at {time.time()-t0:.1f}s')
"; then
    echo "TPU_AVAILABLE"
    exit 0
  fi
  sleep 30
done
echo "TPU_NEVER_CAME_BACK"
exit 1
