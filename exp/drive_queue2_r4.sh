#!/bin/bash
# Post-big30 TPU queue: trace breakdowns, pass-structure A/B, D=1 dist
# (r4 drive script — ran from /tmp; committed for the record)
# bisect, query/hash/histogram benches, final driver re-warm.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=reports/queue2_r4.log
q() {  # q <timeout> <label> <cmd...>
  tmo=$1; shift; lbl=$1; shift
  echo "--- $lbl start $(date)" >> $LOG
  timeout $tmo "$@" >> $LOG 2>&1
  echo "--- $lbl rc=$? $(date)" >> $LOG
}
echo "=== queue2 start $(date)" >> $LOG
q 2400 blk1024_keys    python exp/probe_tile_ab.py 15 27 keys 20 1024
q 3000 blk1024_kv      python exp/probe_tile_ab.py 15 27 kv 20 1024
q 3000 trace_stages    python exp/capture_trace.py stages 24
q 3600 trace_stages_kv python exp/capture_trace.py stages_kv 24
q 900 xprof           python exp/capture_trace.py xprof 24
q 2400 tile18_keys     python exp/probe_tile_ab.py 18 27 keys
q 1800 d1_full24       python exp/probe_d1_24.py full 24
q 1800 d1_sort24       python exp/probe_d1_24.py sort 24
q 1800 d1_exchange24   python exp/probe_d1_24.py exchange 24
q 5400 query_sweep     python -m lsdradixsort_tpu.bench query --n 24 --sweep --verify --out reports/query_r4
q 2400 hash_table      python exp/probe_hash_table.py
q 2400 hist_sweep      python -m lsdradixsort_tpu.bench histogram --n 26 --sweep --verify --out reports/histogram_r4
q 3000 final_bench     env BENCH_DEADLINE_S=2900 python bench.py
q 700 driver_rehearsal python bench.py
echo "=== queue2 done $(date)" >> $LOG
