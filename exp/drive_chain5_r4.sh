#!/bin/bash
# Final evening chain: wait for stages_kv, then time30(fixed) -> query(n22)
# -> d1 stage bisect -> final bench -> rehearsal -> xprof. Ordered by
# VERDICT priority; drops hist/tile18 if the round ends first.
export PYTHONPATH=/root/repo:/root/.axon_site
export LSD_DEBUG=1
cd /root/repo
Q=reports/queue2_r4.log
while ps -p 27212 > /dev/null 2>&1; do sleep 20; done
q() { tmo=$1; shift; lbl=$1; shift
  echo "--- $lbl start $(date)" >> $Q
  timeout $tmo "$@" >> $Q 2>&1
  echo "--- $lbl rc=$? $(date)" >> $Q
}
echo "--- time30_fixed start $(date)" >> reports/big30_r4.log
timeout 4500 python exp/drive_big30.py time >> reports/big30_r4.log 2>&1
echo "--- time30_fixed rc=$? $(date)" >> reports/big30_r4.log
q 3000 query_sweep22   python -m lsdradixsort_tpu.bench query --n 22 --sweep --verify --out reports/query_r4
q 1200 d1_sort24       python exp/probe_d1_24.py sort 24
q 1200 d1_splitters24  python exp/probe_d1_24.py splitters 24
q 1200 d1_plan24       python exp/probe_d1_24.py plan 24
q 1200 d1_exchange24   python exp/probe_d1_24.py exchange 24
q 1500 final_bench     env BENCH_DEADLINE_S=1400 python bench.py
q 700  driver_rehearsal python bench.py
q 900  xprof           python exp/capture_trace.py xprof 24
q 2400 hist_sweep      python -m lsdradixsort_tpu.bench histogram --n 26 --sweep --verify --out reports/histogram_r4
echo "=== chain5 done $(date)" >> $Q
