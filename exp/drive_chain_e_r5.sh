#!/bin/bash
# r5 chain E (session C, post-outage): runs after the no-deadline bench
# warming run exits. Priorities per VERDICT r4: (5) live flagship capture
# rehearsal, (8) skew fallback e2e, (4) query on-chip A/B, (7) 64-bit
# sort A/B, then the 2^30 records as stretch goals.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
Q=reports/chain_e_r5.log
q() { tmo=$1; shift; lbl=$1; shift
  python exp/wait_tpu.py 7200 >> $Q 2>&1 || { echo "--- $lbl SKIP (no TPU) $(date)" >> $Q; return; }
  echo "--- $lbl start $(date)" >> $Q
  timeout $tmo "$@" >> $Q 2>&1
  echo "--- $lbl rc=$? $(date)" >> $Q
}
echo "=== chain E start $(date)" >> $Q
# wait for the warming bench (any bench.py) to finish
while pgrep -x -a python | grep -q "bench.py"; do sleep 20; done
echo "=== warming bench done $(date)" >> $Q
q 900  bench_rehearsal python bench.py
q 1500 skew_fallback   python exp/probe_skew_fallback.py
q 4200 query_sweep22   python -m lsdradixsort_tpu.bench query --n 22 --sweep --verify --budget 3300 --out reports/query_r5
q 900  bench_rehearsal2 python bench.py
q 3600 sort24_sweep    python -m lsdradixsort_tpu.bench sort --n 24 --sweep --verify --budget 3000 --out reports/sort_r5
q 7200 keys30_verify   python exp/drive_merge30.py verify
q 3600 keys30_time     python exp/drive_merge30.py time
q 9000 big30_verify    env LSD_DEBUG=1 python exp/drive_big30.py verify
q 5400 big30_time      env LSD_DEBUG=1 python exp/drive_big30.py time
echo "=== chain E done $(date)" >> $Q
