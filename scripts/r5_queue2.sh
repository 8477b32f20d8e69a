#!/bin/bash
# Round-5 follow-up queue: retries the MLDG-300 uncapped rerun whose first
# attempt hit a stuck remote compile (killed at 0% CPU after 20 min — the
# known axon failure mode, CLAUDE.md campaign etiquette), then re-renders.
# Waits for r5_queue.sh to finish (single-client chip).
#   nohup bash scripts/r5_queue2.sh > /tmp/r5_queue2.log 2>&1 &
set -u
cd /root/repo

log() { echo "[$(date +%H:%M:%S)] $*"; }

while [ ! -f /tmp/r5_queue.done ]; do sleep 60; done
log "r5_queue done — starting follow-ups"

# MLDG (and anything else requeue_unresolved deleted) at cap 300. Retry up
# to 3 times: per-epoch resume snapshots (resume_every=10) make retries
# continue rather than restart, and a fresh process recovers from both
# stuck compiles and TPU worker crashes.
for attempt in 1 2 3; do
  log "uncapped rerun attempt $attempt"
  CAMPAIGN_EPOCHS=300 timeout 7200 python scripts/campaign_others.py \
    --benches=Taobao-10,Taobao_20 > /tmp/r5_campaign300_a$attempt.log 2>&1
  rc=$?
  log "attempt $attempt rc=$rc"
  if [ $rc -eq 0 ]; then break; fi
done

python scripts/render_results.py > /tmp/r5_render2.log 2>&1
log "re-render rc=$?"
touch /tmp/r5_queue2.done
log "r5 queue2 complete"
