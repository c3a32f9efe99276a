#!/bin/bash
# Probe-gated benchmark runner: wait for the axon relay to come back, then
# run ONE command in the session that opens.  Hard total wall-clock budget
# (CLAUDE.md: external watchdogs bound every retry schedule) — exits 3 when
# the budget expires without a session, never sleeps past it.
#
# usage: run_when_up.sh <budget_s> <cmd...>
set -u
BUDGET=${1:?budget seconds}; shift
START=$(date +%s)
while :; do
  left=$((BUDGET - ($(date +%s) - START)))
  if [ "$left" -lt 130 ]; then echo "run_when_up: budget expired" >&2; exit 3; fi
  if timeout 100 python "$(dirname "$0")/../bench.py" --probe >/dev/null 2>&1; then
    exec timeout "$((left - 10))" "$@"
  fi
  sleep 45
done
