#!/bin/bash
# Post-recovery on-chip sequence (run AFTER exp/watch_tpu_and_probe.sh's
# probes finish — one TPU process at a time). Verifies the pad-layout
# change across every suite, A/Bs the query engines, and re-runs the
# flagship. Logs to /tmp/onchip_r2c.log.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
{
  timeout 2400 python -m lsdradixsort_tpu.bench sort --n 27 --verify --out reports/sort_r2c
  timeout 2400 python -m lsdradixsort_tpu.bench tile_sort --n 26 --verify --out reports/tile_sort_r2c
  timeout 3600 python -m lsdradixsort_tpu.bench query --n 26 --verify --sweep --out reports/query_r2c
  timeout 1200 python bench.py --verify --kv
  timeout 3000 python exp/drive_kv29.py verify
} >> /tmp/onchip_r2c.log 2>&1
echo "=== drive_onchip_r2c done rc=$? $(date)" >> /tmp/onchip_r2c.log
