#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
export LSD_DEBUG=1
cd /root/repo
LOG=reports/big30_r4.log
echo "=== big30 r4 chain4 (input-ownership fix) start $(date)" >> $LOG
timeout 10800 python exp/drive_big30.py verify >> $LOG 2>&1
rc=$?
echo "--- verify(chain4) rc=$rc $(date)" >> $LOG
if [ $rc -eq 0 ]; then
  timeout 7200 python exp/drive_big30.py time >> $LOG 2>&1
  echo "--- time(chain4) rc=$? $(date)" >> $LOG
fi
Q=reports/queue2_r4.log
q() { tmo=$1; shift; lbl=$1; shift
  echo "--- $lbl start $(date)" >> $Q
  timeout $tmo "$@" >> $Q 2>&1
  echo "--- $lbl rc=$? $(date)" >> $Q
}
q 1800 d1_full24       python exp/probe_d1_24.py full 24
q 5400 query_sweep     python -m lsdradixsort_tpu.bench query --n 24 --sweep --verify --out reports/query_r4
q 2400 hash_table      python exp/probe_hash_table.py
q 3600 trace_stages_kv python exp/capture_trace.py stages_kv 24
q 900  xprof           python exp/capture_trace.py xprof 24
q 3000 final_bench     env BENCH_DEADLINE_S=2900 python bench.py
q 700  driver_rehearsal python bench.py
q 2400 hist_sweep      python -m lsdradixsort_tpu.bench histogram --n 26 --sweep --verify --out reports/histogram_r4
q 2400 tile18_keys     python exp/probe_tile_ab.py 18 27 keys
echo "=== chain4 done $(date)" >> $Q
