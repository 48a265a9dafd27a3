#!/bin/bash
# Round-5 follow-up queue: the batch-64 time-to-quality DECIDING run.
# The matched-SAMPLE-budget arm (smoke_indirect_b64: 500/1000 iters at
# batch 64) landed 2.13e-4 — 1.8x worse than the batch-8 protocol's
# 1.16-1.23e-4 in 19.5 vs 24.5-28.6 min: optimizer STEPS bind, not
# samples. This arm gives batch 64 a 2x/3x step budget (1000 CFE+OP /
# 3000 e2e = 3/8 of the batch-8 step count, 3x the samples) — projected
# wall ~20 min, still under the batch-8 protocol. If it reaches the
# batch-8 band, batch 64 wins time-to-equal-quality and the judged
# operating point flips; if not, the negative is measured on a curve.
#
# Gates on the r7 queue either reaching its CPU-only closer
# (spatial_converge — the chip is free from there on) or finishing.
cd /root/repo || exit 1
mkdir -p runs/queue_logs
STATUS=runs/queue_logs/r8_status.txt
: > "$STATUS"
echo "$$" > runs/queue_logs/r8.pgid
echo "launch=$(date -u +%F_%H:%M:%S)" >> "$STATUS"
DEADLINE=$(( $(date +%s) + 17400 ))

snapshot_commit() {
  python scripts/snapshot_artifacts.py >/dev/null 2>&1
  git add artifacts/ >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "$1" >/dev/null 2>&1
}

# Gate: r7 must be past its chip items (max 5 h of polling).
for i in $(seq 1 150); do
  [ -f .abort_r8 ] && { echo ABORTED >> "$STATUS"; exit 0; }
  grep -qE "spatial_converge start|spatial_converge SKIPPED|ALL_DONE" \
      runs/queue_logs/r7_status.txt 2>/dev/null && break
  sleep 120
done
echo "r7 chip items done $(date -u +%H:%M:%S)" >> "$STATUS"
if [ "$(date +%s)" -gt "$DEADLINE" ]; then
  echo "DEADLINE passed; not starting" >> "$STATUS"; exit 0
fi

echo "=== smoke_indirect_b64b start $(date -u +%H:%M:%S) ===" >> "$STATUS"
timeout 4500 python -m pde_control_tpu.experiments.run smoke_indirect \
    --batch 64 --lr-scale 2.83 --iterations 1000 --e2e-iterations 3000 \
    --num-train 512 --datadir data/smoke_indirect --resume \
    --workdir runs/smoke_indirect_b64b \
    > runs/queue_logs/smoke_indirect_b64b_r8.log 2>&1
echo "=== smoke_indirect_b64b rc=$? end $(date -u +%H:%M:%S) ===" >> "$STATUS"
snapshot_commit "Snapshot judged artifacts after smoke_indirect_b64b (r8 queue)"
echo ALL_DONE $(date -u +%H:%M:%S) >> "$STATUS"
