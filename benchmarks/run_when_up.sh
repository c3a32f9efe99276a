#!/bin/bash
# Probe-gated benchmark runner with per-attempt bounds: wait for the axon
# relay, run the command in a fresh subprocess with its own timeout, and if
# the attempt dies (relay dropped mid-run) probe + retry.  Hard TOTAL
# wall-clock budget (CLAUDE.md: external watchdogs bound every retry
# schedule) — exits 3 when the budget expires, and every sleep is gated on
# the remaining budget too (a sleep must never be what carries the script
# past an external watchdog).
#
# usage: run_when_up.sh <total_budget_s> <attempt_timeout_s> <cmd...>
set -u
BUDGET=${1:?total budget seconds}; ATTEMPT=${2:?per-attempt timeout seconds}; shift 2
START=$(date +%s)
HERE=$(dirname "$0")
left() { echo $((BUDGET - ($(date +%s) - START))); }
# exit 3 unless the remaining budget covers $1 seconds of upcoming work
# plus the next loop-top check (130s: probe timeout + margin)
need() { if [ "$(left)" -lt $(($1 + 130)) ]; then
           echo "run_when_up: budget expired" >&2; exit 3; fi; }
while :; do
  need 0
  if ! timeout 100 python "$HERE/../bench.py" --probe >/dev/null 2>&1; then
    need 45; sleep 45; continue
  fi
  l=$(left)
  cap=$((ATTEMPT < l - 10 ? ATTEMPT : l - 10))
  # never launch a doomed attempt: a cap squeezed far below the requested
  # timeout (the probe ate the budget's tail) is guaranteed to be killed
  # mid-run — that's budget expiry, not an attempt failure, and a command
  # without bench.py's kill-safe artifact discipline could leave partial
  # output.  Floor: 1/4 of the requested timeout (min 60s), overridable.
  MIN_CAP=${RUN_WHEN_UP_MIN_ATTEMPT_S:-$((ATTEMPT / 4 > 60 ? ATTEMPT / 4 : 60))}
  if [ "$cap" -lt "$MIN_CAP" ]; then
    echo "run_when_up: budget expired (cap ${cap}s < min ${MIN_CAP}s)" >&2
    exit 3
  fi
  timeout "$cap" "$@" && exit 0
  echo "run_when_up: attempt failed (rc=$?), re-probing" >&2
  need 30; sleep 30
done
