#!/bin/bash
# Multi-process data-parallel launcher — the analog of the reference's
# tools/dist_train.sh (/root/reference/tools/dist_train.sh:5, which wraps
# torch.distributed.launch). On TPU pods each host normally runs the same
# command and `--dist` picks the cluster up from pod metadata; this script
# covers the explicit-coordinator case (CPU/GPU clusters, local testing):
#
#   tools/dist_train.sh <nprocs> <config> [extra train.py args...]
#
# Example (2-process local smoke run on the CPU backend):
#   JAX_PLATFORMS=cpu tools/dist_train.sh 2 configs/car.py --synthetic
set -e
NPROCS=$1
CONFIG=$2
shift 2
PORT=${PORT:-$(( 20000 + RANDOM % 20000 ))}
PIDS=()
for ((i = 0; i < NPROCS; i++)); do
  python "$(dirname "$0")/train.py" "$CONFIG" \
      --coordinator "localhost:${PORT}" \
      --num_processes "$NPROCS" --process_id "$i" "$@" &
  PIDS+=($!)
done
code=0
for p in "${PIDS[@]}"; do
  wait "$p" || code=$?
done
exit $code
