#!/bin/bash
# background TPU health monitor: writes status lines to /tmp/tpu_health.log
for i in $(seq 1 60); do
  if timeout 45 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.arange(4.)*2)" >/dev/null 2>&1; then
    echo "$(date +%H:%M:%S) ALIVE" >> /tmp/tpu_health.log
    exit 0
  else
    echo "$(date +%H:%M:%S) dead" >> /tmp/tpu_health.log
  fi
  sleep 120
done
