#!/usr/bin/env bash
# Flake soak for the 2-process DCN tests (VERDICT r3 item 6): run the
# jax.distributed pair N times back-to-back and record consecutive greens.
#
#   bash tools/dcn_soak.sh [N] [logfile]
set -u
cd "$(dirname "$0")/.."
N=${1:-20}
LOG=${2:-/tmp/dcn_soak.log}
pass=0
for i in $(seq 1 "$N"); do
  start=$(date -u +%H:%M:%S)
  if ETPU_PLATFORM=cpu python -m pytest \
      tests/test_multiprocess.py::test_two_process_dcn_equals_single_process \
      -x -q >>"$LOG" 2>&1; then
    pass=$((pass + 1))
    echo "run $i/$N: PASS (started $start, $(date -u +%H:%M:%S))" | tee -a "$LOG"
  else
    echo "run $i/$N: FAIL (started $start) — see $LOG" | tee -a "$LOG"
    echo "soak result: $pass consecutive greens, then a failure" | tee -a "$LOG"
    exit 1
  fi
done
echo "soak result: $pass/$N consecutive greens" | tee -a "$LOG"
