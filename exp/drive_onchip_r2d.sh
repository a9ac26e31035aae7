#!/bin/bash
# Round-2d post-recovery on-chip sequence (TPU tunnel outage queue).
# One TPU process at a time (two sharers -> FAILED_PRECONDITION).
# Logs to /tmp/onchip_r2d.log. Order: decision probes first (CE, pipeline,
# histogram packing), then the re-benches that depend on the decisions.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
{
  echo "=== r2d start $(date)"
  # 1. decision probes
  timeout 3000 python exp/probe_ce_reshape.py
  timeout 3600 python exp/probe_merge_pipeline.py roll
  timeout 1800 python exp/probe_hash_table.py
  # 2. per-kernel suites with verify (histogram sweep carries the cb A/B)
  timeout 3000 python -m lsdradixsort_tpu.bench histogram --n 27 --verify --sweep --out reports/histogram_r2d
  timeout 2400 python -m lsdradixsort_tpu.bench sort --n 27 --verify --out reports/sort_r2d
  timeout 3600 python -m lsdradixsort_tpu.bench query --n 26 --verify --sweep --out reports/query_r2d
  timeout 1800 python -m lsdradixsort_tpu.bench dist --n 22 --verify --out reports/dist_r2d
  timeout 1800 python -m lsdradixsort_tpu.bench scan --n 27 --verify --out reports/scan_r2d
  timeout 1800 python -m lsdradixsort_tpu.bench tile_sort --n 24 --verify --out reports/tile_sort_r2d
  timeout 1800 python -m lsdradixsort_tpu.bench shuffle --n 26 --verify --out reports/shuffle_r2d
  # 3. flagship + kv
  timeout 1200 python bench.py --verify --kv
  # 4. at-scale re-verify of the round-2c/2d changes (pad layout, DMA
  #    pipelining): reference-scale keys sort + the 4 GB kv sort
  timeout 3000 python exp/drive_merge30.py verify
  timeout 1800 python exp/drive_merge30.py time
  timeout 3000 python exp/drive_kv29.py verify
  timeout 1800 python exp/drive_kv29.py time
  # 5. remaining decision probe from ROADMAP s8
  timeout 3000 python exp/probe_merge_phases.py
  echo "=== drive_onchip_r2d done rc=$? $(date)"
} >> /tmp/onchip_r2d.log 2>&1
