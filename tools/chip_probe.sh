#!/bin/bash
# Probe the tunneled TPU until it answers a trivial op; log to $1.
log="${1:-/tmp/chip_probe.log}"
for i in $(seq 1 60); do
  if timeout 240 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((256,256)).sum()))" >/dev/null 2>&1; then
    echo "CHIP BACK after probe $i ($(date +%H:%M:%S))" >> "$log"
    exit 0
  fi
  echo "probe $i failed ($(date +%H:%M:%S))" >> "$log"
  sleep 90
done
echo "chip never recovered" >> "$log"
