#!/usr/bin/env bash
# Warm the persistent XLA jit cache for the oracle/fidelity tier, then time a
# verification run.  First invocation pays the compiles (tens of minutes on a
# 1-core host); every later `python -m pytest tests -m oracle -q` — same
# machine, same jax build — reuses /tmp/omnitokenizer-jax-cache (override via
# OMNITOK_JIT_CACHE) and completes in minutes.
#
# Usage: scripts/warm_oracle_tier.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
echo "== warm pass (compiles cached to ${OMNITOK_JIT_CACHE:-/tmp/omnitokenizer-jax-cache})"
python -m pytest tests -m oracle -q "$@"
echo "== timed verification pass (warm cache)"
time python -m pytest tests -m oracle -q "$@"
