#!/bin/bash
# r5 chain D v2: health-gated; bench rehearsal FIRST on recovery (secures
# the flagship live-kv capture), then the 2^30 kv evidence, then probes.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
Q=reports/chain_c_r5.log
q() { tmo=$1; shift; lbl=$1; shift
  python exp/wait_tpu.py 18000 >> $Q 2>&1 || { echo "--- $lbl SKIP (no TPU) $(date)" >> $Q; return; }
  echo "--- $lbl start $(date)" >> $Q
  timeout $tmo "$@" >> $Q 2>&1
  echo "--- $lbl rc=$? $(date)" >> $Q
}
echo "=== chain D v2 start $(date)" >> $Q
q 1200 bench_rehearsal1 python bench.py
q 9000 big30_verify    env LSD_DEBUG=1 python exp/drive_big30.py verify
q 5400 big30_time      env LSD_DEBUG=1 python exp/drive_big30.py time
q 3600 kv_buf19        env CONFIGS=15:19 python exp/probe_kv_tuning.py
q 3600 kv_tile18       env CONFIGS=18:20,18:19 python exp/probe_kv_tuning.py
q 4500 query_sweep22   python -m lsdradixsort_tpu.bench query --n 22 --sweep --verify --budget 3600 --out reports/query_r5
q 1800 skew_fallback   python exp/probe_skew_fallback.py
q 2400 keys_buf19      env CONFIGS=15:19 python exp/probe_kv_tuning.py keys
q 900  bench_rehearsal2 python bench.py
q 7200 keys30_verify   python exp/drive_merge30.py verify
q 3600 keys30_time     python exp/drive_merge30.py time
echo "=== chain D v2 done $(date)" >> $Q
