#!/bin/bash
# Round-5 ring-vs-exact aux A/B: two sequential relaunch-loop runs + evals.
cd /root/repo
for arm in ring exact; do
  mkdir -p runs/aux_ab_r5_$arm
  while true; do
    timeout 3000 python tools/train.py configs/aux_ab_r5_$arm.py \
        --epochs_per_run 4 >> runs/aux_ab_r5_$arm/driver.log 2>&1
    rc=$?
    echo "$(date -u +%H:%M:%S) chunk exited rc=$rc" >> runs/aux_ab_r5_$arm/driver.log
    if [ $rc -eq 75 ] || [ $rc -eq 124 ]; then continue; fi
    break
  done
  echo "TRAIN COMPLETE rc=$rc" >> runs/aux_ab_r5_$arm/driver.log
  timeout 3000 python tools/test.py configs/aux_ab_r5_$arm.py \
      runs/aux_ab_r5_$arm/checkpoint_epoch_11.msgpack \
      > runs/aux_ab_r5_$arm/eval_final.log 2>&1
  echo "EVAL COMPLETE rc=$?" >> runs/aux_ab_r5_$arm/driver.log
done
echo "AB COMPLETE"
