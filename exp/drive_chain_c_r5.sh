#!/bin/bash
# r5 chain C (replaces chain B; runs after chain A's shell exits):
# re-drive the 2^30 kv sort (its chain-A phases were lost to the wedged
# compile helper), then the kv/keys config A/B, query sweep, skew e2e,
# and a final new-capture bench rehearsal. One process per batch.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
Q=reports/chain_c_r5.log
WAIT_PID=$1
if [ -n "$WAIT_PID" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 20; done
fi
q() { tmo=$1; shift; lbl=$1; shift
  echo "--- $lbl start $(date)" >> $Q
  timeout $tmo "$@" >> $Q 2>&1
  echo "--- $lbl rc=$? $(date)" >> $Q
}
echo "=== chain C start $(date)" >> $Q
echo "--- big30 verify start $(date)" >> reports/big30_r5.log
LSD_DEBUG=1 timeout 9000 python exp/drive_big30.py verify >> reports/big30_r5.log 2>&1
echo "--- big30 verify rc=$? $(date)" >> reports/big30_r5.log
echo "--- big30 time start $(date)" >> reports/big30_r5.log
LSD_DEBUG=1 timeout 5400 python exp/drive_big30.py time >> reports/big30_r5.log 2>&1
echo "--- big30 time rc=$? $(date)" >> reports/big30_r5.log
q 3600 kv_buf19        env CONFIGS=15:19 python exp/probe_kv_tuning.py
q 3600 kv_tile18       env CONFIGS=18:20,18:19 python exp/probe_kv_tuning.py
q 2400 keys_buf19      env CONFIGS=15:19 python exp/probe_kv_tuning.py keys
q 4500 query_sweep22   python -m lsdradixsort_tpu.bench query --n 22 --sweep --verify --budget 3600 --out reports/query_r5
q 1800 skew_fallback   python exp/probe_skew_fallback.py
q 900  bench_rehearsal python bench.py
echo "=== chain C done $(date)" >> $Q
