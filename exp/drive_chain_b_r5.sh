#!/bin/bash
# r5 chain B (runs after chain A's shell exits): kv/keys config A/B,
# query-suite on-chip sweep (engine A/B), skew-fallback e2e, 64-bit
# decision record. One process per batch (ROADMAP 7c).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
Q=reports/chain_b_r5.log
WAIT_PID=$1
if [ -n "$WAIT_PID" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 20; done
fi
q() { tmo=$1; shift; lbl=$1; shift
  echo "--- $lbl start $(date)" >> $Q
  timeout $tmo "$@" >> $Q 2>&1
  echo "--- $lbl rc=$? $(date)" >> $Q
}
echo "=== chain B start $(date)" >> $Q
q 3600 kv_buf19        env CONFIGS=15:19 python exp/probe_kv_tuning.py
q 3600 kv_tile18       env CONFIGS=18:20,18:19 python exp/probe_kv_tuning.py
q 2400 keys_buf19      env CONFIGS=15:19 python exp/probe_kv_tuning.py keys
q 4500 query_sweep22   python -m lsdradixsort_tpu.bench query --n 22 --sweep --verify --budget 3600 --out reports/query_r5
q 1800 skew_fallback   python exp/probe_skew_fallback.py
q 6000 sort_sweep24    python -m lsdradixsort_tpu.bench sort --n 24 --sweep --verify --budget 5000 --out reports/sort_r5
echo "=== chain B done $(date)" >> $Q
