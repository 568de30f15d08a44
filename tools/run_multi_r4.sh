#!/bin/bash
# Round-4 multi-class convergence run: relaunch loop (exit 75 = more epochs).
cd /root/repo
mkdir -p runs/run_multi_r4
while true; do
  timeout 3000 python tools/train.py configs/multi_convergence_r4.py \
      --epochs_per_run 5 >> runs/run_multi_r4/driver.log 2>&1
  rc=$?
  echo "$(date -u +%H:%M:%S) chunk exited rc=$rc" >> runs/run_multi_r4/driver.log
  if [ $rc -eq 75 ] || [ $rc -eq 124 ]; then continue; fi
  break
done
echo "RUN COMPLETE rc=$rc" >> runs/run_multi_r4/driver.log
