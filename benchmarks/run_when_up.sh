#!/bin/bash
# Probe-gated benchmark runner with per-attempt bounds: wait for the axon
# relay, run the command in a fresh subprocess with its own timeout, and if
# the attempt dies (relay dropped mid-run) probe + retry.  Hard TOTAL
# wall-clock budget (CLAUDE.md: external watchdogs bound every retry
# schedule) — exits 3 when the budget expires, never sleeps past it.
#
# usage: run_when_up.sh <total_budget_s> <attempt_timeout_s> <cmd...>
set -u
BUDGET=${1:?total budget seconds}; ATTEMPT=${2:?per-attempt timeout seconds}; shift 2
START=$(date +%s)
HERE=$(dirname "$0")
while :; do
  left=$((BUDGET - ($(date +%s) - START)))
  if [ "$left" -lt 130 ]; then echo "run_when_up: budget expired" >&2; exit 3; fi
  if ! timeout 100 python "$HERE/../bench.py" --probe >/dev/null 2>&1; then
    sleep 45; continue
  fi
  left=$((BUDGET - ($(date +%s) - START)))
  cap=$((ATTEMPT < left - 10 ? ATTEMPT : left - 10))
  timeout "$cap" "$@" && exit 0
  echo "run_when_up: attempt failed (rc=$?), re-probing" >&2
  sleep 30
done
