#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
# (r4 drive script — ran from /tmp; committed for the record)
export LSD_DEBUG=1
cd /root/repo
LOG=reports/big30_r4.log
echo "=== big30 r4 STREAMING rerun start $(date)" >> $LOG
timeout 7200 python exp/drive_big30.py verify >> $LOG 2>&1
rc=$?
echo "--- verify(streaming) rc=$rc $(date)" >> $LOG
if [ $rc -eq 0 ]; then
  timeout 5400 python exp/drive_big30.py time >> $LOG 2>&1
  echo "--- time(streaming) rc=$? $(date)" >> $LOG
fi
echo "=== big30 rerun done $(date)" >> $LOG
# then continue with the rest of the TPU queue
/tmp/run_queue2.sh
