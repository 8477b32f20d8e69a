#!/bin/bash
# Round-4 follow-on TPU stages: runs after r4_queue.sh finishes.
#   nohup bash scripts/r4_queue2.sh > /tmp/r4_queue2.log 2>&1 &

set -u
cd /root/repo
export CAMPAIGN_EPOCHS=50

log() { echo "[$(date +%H:%M:%S)] $*"; }

log "waiting for /tmp/r4_queue.done"
while [ ! -f /tmp/r4_queue.done ]; do sleep 60; done
log "primary queue done"

run_stage() { # name cmd timeout attempts
  local name="$1" cmd="$2" tmo="$3" attempts="$4" rc=1
  for i in $(seq 1 "$attempts"); do
    log "stage $name attempt $i/$attempts: $cmd (timeout ${tmo}s)"
    timeout "$tmo" $cmd >> "/tmp/r4_${name}.log" 2>&1
    rc=$?
    log "stage $name attempt $i rc=$rc"
    [ "$rc" -eq 0 ] && break
    sleep 20
  done
  return $rc
}

# A13 MAMDR-vs-DN margin adjudication (adds DN rows at seeds 18/19)
run_stage vara13dn "python scripts/variance_amazon13.py" 7200 3
# The r3 variance blocks predate the ETL split-guard fix — refresh them on
# the fixed data so every variance block matches the campaign recipe.
run_stage vara6   "python scripts/variance_amazon6.py"   7200 3
run_stage vart20  "python scripts/variance_taobao20.py" 10000 3

log "queue2 complete"
touch /tmp/r4_queue2.done
