#!/bin/bash
# Wait for the axon TPU tunnel to come back, then run the round-2 CE A/B
# probes sequentially, logging to /tmp/ce_probe_run.log.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
while true; do
  if timeout 120 python -c "import jax; jax.devices(); import jax.numpy as jnp; jnp.arange(4).sum().block_until_ready()" >/dev/null 2>&1; then
    echo "TPU UP at $(date)" >> /tmp/ce_probe_run.log
    break
  fi
  echo "tpu down $(date)" >> /tmp/ce_probe_run.log
  sleep 60
done
timeout 1800 python exp/probe_ce_reshape.py >> /tmp/ce_probe_run.log 2>&1
echo "=== ce_reshape done rc=$? $(date)" >> /tmp/ce_probe_run.log
timeout 3000 python exp/probe_merge_phases.py >> /tmp/ce_probe_run.log 2>&1
echo "=== merge_phases done rc=$? $(date)" >> /tmp/ce_probe_run.log
