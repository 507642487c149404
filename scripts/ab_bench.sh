#!/usr/bin/env bash
# Repeated bench runs on the attached chip, optionally A/B-ing an env flag:
#   scripts/ab_bench.sh [reps] [ENV_FLAG]
# With ENV_FLAG set, runs reps x {FLAG=0, FLAG=1}; without, just reps runs.
# (The OMNITOK_PATCH_KERNEL A/B this script was built for is concluded:
#  the Mosaic relayout kernel failed to compile — sub-128-lane shape cast —
#  and was retired; see PERF.md round 3.)
set -u
cd "$(dirname "$0")/.."
REPS=${1:-2}
FLAG=${2:-}
if [ -n "$FLAG" ]; then
  for v in 0 1; do
    for i in $(seq 1 "$REPS"); do
      echo "--- $FLAG=$v run $i"
      env "$FLAG=$v" timeout 900 python bench.py
    done
  done
else
  for i in $(seq 1 "$REPS"); do
    echo "--- run $i"
    timeout 900 python bench.py
  done
fi
