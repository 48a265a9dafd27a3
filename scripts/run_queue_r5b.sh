#!/bin/bash
# Round-4 queue B (post-training evals): waits for queue A to release the
# chip (ALL_DONE or its hard stop), then runs the eval-only OOD
# generalization entries on the freshly trained seed-1 checkpoints, the
# n=64 adjoint lr-sensitivity check, and a bench.py pass (repopulates the
# judged-program compile cache and produces the new batch-64/MFU-bounds
# JSON before the driver's round-end bench).
cd /root/repo
mkdir -p runs/queue_logs
STATUS=runs/queue_logs/r5b_status.txt
: > "$STATUS"
A_STATUS=runs/queue_logs/r5a_status.txt
LAUNCH=$(date +%s)
A_HARD_STOP=$((LAUNCH + 4 * 3600 + 2700))   # queue A's own hard stop bound
HARD_STOP=$((LAUNCH + 5 * 3600 + 2700))
echo "launch=$(date -u +%H:%M:%S)" >> "$STATUS"

while :; do
  grep -q ALL_DONE "$A_STATUS" 2>/dev/null && break
  [ "$(date +%s)" -ge "$A_HARD_STOP" ] && break
  sleep 120
done
echo "queue A released chip $(date -u +%H:%M:%S)" >> "$STATUS"

run() {
  name=$1; budget=$2; shift 2
  now=$(date +%s)
  remain=$((HARD_STOP - now))
  [ "$remain" -le 60 ] && { echo "=== $name SKIPPED $(date -u +%H:%M:%S) ===" >> "$STATUS"; return; }
  [ "$budget" -gt "$remain" ] && budget=$remain
  echo "=== $name start $(date -u +%H:%M:%S) (budget ${budget}s) ===" >> "$STATUS"
  timeout "$budget" "$@" > "runs/queue_logs/${name}_r5b.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> "$STATUS"
}

# Generalization evals ride whichever seed-1 checkpoint landed; fall back
# to the restored seed-0 runs if queue A was cut short.
SHAPE_CKPT=runs/shape_transition_s1/ckpt_final
[ -d "$SHAPE_CKPT" ] || SHAPE_CKPT=runs/shape_transition/ckpt_final
SMOKE_CKPT=runs/smoke_indirect_s1/ckpt_final
[ -d "$SMOKE_CKPT" ] || SMOKE_CKPT=runs/smoke_indirect/ckpt_final

[ -d "$SHAPE_CKPT" ] && run generalize_shapes 2400 \
    python -m pde_control_tpu.experiments.run generalize_shapes \
    --init-from "$SHAPE_CKPT" --workdir runs/generalize_shapes
[ -d "$SMOKE_CKPT" ] && run generalize_smoke 3600 \
    python -m pde_control_tpu.experiments.run generalize_smoke \
    --init-from "$SMOKE_CKPT" --workdir runs/generalize_smoke
run adjoint64_lr 2400 python scripts/adjoint64_lr.py 0.1
run bench 4200 python bench.py
python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo ALL_DONE >> "$STATUS"
