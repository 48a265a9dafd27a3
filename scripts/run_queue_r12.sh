#!/bin/bash
# Round-5 final chip item: the adjoint iteration-budget point at the BEST
# measured lr (0.02 — the lr-0.02/300-iter point landed 6.67e-3, above
# zero force for the first time at n=64, so the informative budget
# question is whether 1000 iters at that lr closes the ~7x gap to the
# staggered hierarchy). Chosen over a futile 50-min partial of the ~2 h
# refined config-5 training. Gated on r11's exit.
cd /root/repo || exit 1
mkdir -p runs/queue_logs
STATUS=runs/queue_logs/r12_status.txt
: > "$STATUS"
echo "$$" > runs/queue_logs/r12.pgid
echo "launch=$(date -u +%F_%H:%M:%S)" >> "$STATUS"
DEADLINE=1787282746   # 03:25:46 UTC

snapshot_commit() {
  python scripts/snapshot_artifacts.py >/dev/null 2>&1
  git add artifacts/ >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "$1" >/dev/null 2>&1
}

for i in $(seq 1 60); do
  kill -0 "$(cat runs/queue_logs/r11.pgid 2>/dev/null)" 2>/dev/null || break
  sleep 30
done
echo "r11 exited $(date -u +%H:%M:%S)" >> "$STATUS"

left=$(( DEADLINE - $(date +%s) ))
if [ "$left" -lt 600 ]; then
  echo "SKIPPED (deadline)" >> "$STATUS"; exit 0
fi
echo "=== adjoint64_lr002_budget start $(date -u +%H:%M:%S) (budget ${left}s) ===" >> "$STATUS"
timeout "$left" python scripts/adjoint64_lr.py 0.02 1000 \
    > runs/queue_logs/adjoint64_lr002_budget_r12.log 2>&1
echo "=== adjoint64_lr002_budget rc=$? end $(date -u +%H:%M:%S) ===" >> "$STATUS"
snapshot_commit "Snapshot judged artifacts after adjoint64_lr002_budget (r12 queue)"
echo ALL_DONE $(date -u +%H:%M:%S) >> "$STATUS"
