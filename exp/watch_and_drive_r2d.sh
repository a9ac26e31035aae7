#!/bin/bash
# Wait for the axon TPU tunnel, then run the round-2d recovery queue
# (exp/drive_onchip_r2d.sh). One TPU process at a time. Log:
# /tmp/onchip_r2d.log (queue) + /tmp/tpu_watch.log (watch loop).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
while true; do
  if timeout 240 python -c "import jax; jax.devices(); import jax.numpy as jnp; jnp.arange(4).sum().block_until_ready()" >/dev/null 2>&1; then
    echo "TPU UP at $(date)" >> /tmp/tpu_watch.log
    break
  fi
  echo "tpu down $(date)" >> /tmp/tpu_watch.log
  sleep 120
done
bash exp/drive_onchip_r2d.sh
echo "=== recovery queue finished $(date)" >> /tmp/tpu_watch.log
