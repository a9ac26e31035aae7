#!/bin/bash
# Sequential 2^30 stable-kv drive: warm each big program in its own
# (r4 drive script — ran from /tmp; committed for the record)
export PYTHONPATH=/root/repo:/root/.axon_site
# process (ROADMAP §7c), then verify, then time. Logs to reports/.
cd /root/repo
LOG=reports/big30_r4.log
echo "=== big30 r4 start $(date)" >> $LOG
for step in "warm_hist 2400" "warm_sort 3600" "warm_merge 3600" "verify 5400" "time 3600"; do
  set -- $step
  name=$1; tmo=$2
  echo "--- $name start $(date)" >> $LOG
  timeout $tmo python exp/drive_big30.py $name >> $LOG 2>&1
  rc=$?
  echo "--- $name rc=$rc $(date)" >> $LOG
  if [ $rc -ne 0 ] && [ "$name" = "verify" ]; then
    echo "verify failed; aborting before time" >> $LOG; exit 1
  fi
done
echo "=== big30 r4 done $(date)" >> $LOG
