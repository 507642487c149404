#!/usr/bin/env bash
# A/B the tokenizer bench across env-gated fast paths on the attached chip.
# Usage: scripts/ab_bench.sh [reps]
set -u
cd "$(dirname "$0")/.."
REPS=${1:-2}
for flag in 0 1; do
  for i in $(seq 1 "$REPS"); do
    echo "--- OMNITOK_PATCH_KERNEL=$flag run $i"
    OMNITOK_PATCH_KERNEL=$flag timeout 900 python bench.py
  done
done
