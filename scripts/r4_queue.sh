#!/bin/bash
# Round-4 TPU stage queue. The chip is single-client, so every stage runs
# alone, in order, each under timeout + retry (all stages resume from their
# results.json). Logs per stage in /tmp/r4_<stage>.log.
#
#   nohup bash scripts/r4_queue.sh <campaign_others_pid> > /tmp/r4_queue.log 2>&1 &

set -u
cd /root/repo

# Epoch budget: reference protocol is early-stop (bound 99999); 50 is the
# compute-budget cap — rows that hit it carry early_stopped=false.
export CAMPAIGN_EPOCHS=50

WAIT_PID="${1:-}"
log() { echo "[$(date +%H:%M:%S)] $*"; }

if [ -n "$WAIT_PID" ]; then
  log "waiting for campaign_others (pid $WAIT_PID) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  log "pid $WAIT_PID exited"
fi

run_stage() { # name cmd timeout attempts
  local name="$1" cmd="$2" tmo="$3" attempts="$4" rc=1
  for i in $(seq 1 "$attempts"); do
    log "stage $name attempt $i/$attempts: $cmd (timeout ${tmo}s)"
    timeout "$tmo" $cmd >> "/tmp/r4_${name}.log" 2>&1
    rc=$?
    log "stage $name attempt $i rc=$rc"
    [ "$rc" -eq 0 ] && break
    sleep 20  # let a crashed TPU worker settle before the fresh process
  done
  return $rc
}

# Drop rows the old 25-epoch cap clipped (they rerun at the raised cap with
# early_stopped instrumentation). tb30 runs FIRST: (a) its v2 starving-tail
# rows are the round's top VERDICT item, (b) campaign_others'
# build_taobao_splits requires the tb30 raw log to exist.
run_stage prune   "python scripts/prune_capped.py"           600 1
run_stage tb30    "python scripts/campaign_tb30.py"        20000 3
run_stage others  "python scripts/campaign_others.py"      16000 3
run_stage lanes   "python scripts/campaign_amazon_lanes.py" 7200 3
run_stage vart30  "python scripts/variance_taobao30.py"    30000 2
run_stage vart10  "python scripts/variance_taobao10.py"    14000 3

log "queue complete"
touch /tmp/r4_queue.done
