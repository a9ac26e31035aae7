#!/bin/bash
# r5 chain A: after the flagship warm/bench process exits, drive the 2^30
# kv sort — warm each big program in its own process (ROADMAP 7c), then
# the INSTRUMENTED time run (per-phase attribution: the r4 "6.5 s
# selection" claim was wrong, reports/probe_fanout_r5.log), then verify.
# Then the 2^30 keys-only record at the r4 config (VERDICT r4 #2).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=reports/big30_r5.log
WAIT_PID=$1
if [ -n "$WAIT_PID" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 20; done
fi
echo "=== big30 r5 chain A start $(date)" >> $LOG
for step in "warm_sort 3600" "warm_merge 3600" "time 5400" "verify 7200"; do
  set -- $step
  name=$1; tmo=$2
  echo "--- $name start $(date)" >> $LOG
  LSD_DEBUG=1 timeout $tmo python exp/drive_big30.py $name >> $LOG 2>&1
  echo "--- $name rc=$? $(date)" >> $LOG
done
K=reports/keys30_r5.log
echo "=== keys30 r5 start $(date)" >> $K
echo "--- verify start $(date)" >> $K
timeout 7200 python exp/drive_merge30.py verify >> $K 2>&1
rc=$?
echo "--- verify rc=$rc $(date)" >> $K
if [ $rc -eq 0 ]; then
  echo "--- time start $(date)" >> $K
  timeout 3600 python exp/drive_merge30.py time >> $K 2>&1
  echo "--- time rc=$? $(date)" >> $K
fi
echo "=== chain A done $(date)" >> $LOG
