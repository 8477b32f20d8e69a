#!/bin/bash
# Round-5 TPU stage queue (single-client chip: strictly serial).
# Waits for the live recap campaign to exit, then runs the r5 evidence
# stages. Each stage is restartable; logs under /tmp/r5_*.log.
#   nohup bash scripts/r5_queue.sh > /tmp/r5_queue.log 2>&1 &
set -u
cd /root/repo

log() { echo "[$(date +%H:%M:%S)] $*"; }

# ---- stage 0: wait for the running campaign_others recap (if any) ----
while pgrep -f "campaign_others.py" > /dev/null 2>&1; do
  sleep 60
done
log "stage 0: no campaign_others process — chip free"

# ---- stage 1: finish campaign_others (pcgrad@paper row + stragglers) ----
log "stage 1: campaign_others rerun (cap 100)"
CAMPAIGN_EPOCHS=100 timeout 14400 python scripts/campaign_others.py \
  --benches=Taobao-10,Taobao_20 > /tmp/r5_campaign.log 2>&1
log "stage 1 rc=$?"

# ---- stage 2: requeue ONLY check-unresolved capped rows at cap 300 ----
python scripts/requeue_unresolved.py | tee /tmp/r5_requeue.log
log "stage 2: uncapped rerun of unresolved rows (cap 300)"
CAMPAIGN_EPOCHS=300 timeout 21600 python scripts/campaign_others.py \
  --benches=Taobao-10,Taobao_20 > /tmp/r5_campaign300.log 2>&1
log "stage 2 rc=$?"

# ---- stage 3: bisect the A13 lanes crash ----
log "stage 3: bisect_a13_lanes"
timeout 14400 python scripts/bisect_a13_lanes.py > /tmp/r5_bisect_a13.log 2>&1
log "stage 3 rc=$?"

# ---- stage 4: A13 lanes campaign row with the bisect verdict chunk ----
CHUNK=$(python - <<'EOF'
import json, os.path as osp
p = "/root/repo/bisect_a13.json"
chunk = ""
if osp.exists(p):
    r = json.load(open(p))
    # prefer the largest chunk that ran clean (fewest scan groups)
    for c in (7, 4, 2):
        if r.get(f"chunk_{c}", {}).get("status") == "ok":
            chunk = str(c)
            break
    if r.get("chunk_0", {}).get("status") == "ok":
        chunk = "0"  # unchunked runs clean — no gate needed
print(chunk)
EOF
)
if [ -n "$CHUNK" ]; then
  log "stage 4: campaign_amazon_lanes A13 with LANES_CHUNK_A13=$CHUNK"
  LANES_CHUNK_A13=$CHUNK CAMPAIGN_EPOCHS=50 timeout 14400 \
    python scripts/campaign_amazon_lanes.py > /tmp/r5_amazon_lanes.log 2>&1
  log "stage 4 rc=$?"
else
  log "stage 4 SKIPPED: no surviving chunk in bisect_a13.json"
fi

# ---- stage 5: A6 MAMDR-vs-DN seed variance (adds DN rows at s18/s19) ----
log "stage 5: variance_amazon6 (DN adjudication)"
timeout 14400 python scripts/variance_amazon6.py > /tmp/r5_variance_a6.log 2>&1
log "stage 5 rc=$?"

# ---- stage 6: second bench surface (MMoE + STAR fused epochs) ----
log "stage 6: bench_mtl_star"
timeout 3600 python scripts/bench_mtl_star.py > /tmp/r5_bench_mtl.log 2>&1
log "stage 6 rc=$?"

# ---- stage 7: prewarm the flagship bench cache, then verify bench ----
log "stage 7: prewarm_bench + bench.py"
timeout 1800 python scripts/prewarm_bench.py > /tmp/r5_prewarm.log 2>&1
log "prewarm rc=$?"
timeout 590 python bench.py > /tmp/r5_bench.json 2> /tmp/r5_bench.log
log "bench rc=$?  $(cat /tmp/r5_bench.json 2>/dev/null | head -c 300)"

# ---- stage 8: render ----
python scripts/render_results.py > /tmp/r5_render.log 2>&1
log "stage 8 (render) rc=$?"

touch /tmp/r5_queue.done
log "r5 queue complete"
