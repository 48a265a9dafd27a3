#!/bin/bash
# Round-5 queue, revision 10. r9's shape_transition_s0r5 lost ~25 min of
# its budget to the post-reset cold-cache data-generation compile (the
# fifth reset wiped .jax_cache; the generation program alone took 24 min
# to come back over the relay). r9 was aborted at the item boundary so its
# guarded rings-chain items wouldn't be skipped; this queue resumes s0r5
# (data now on disk, cache warm) and runs the chain to completion, then
# gives the refined config-5 training whatever chip time remains.
# Kill switch: touch /root/repo/.abort_r10.
cd /root/repo || exit 1
mkdir -p runs/queue_logs
STATUS=runs/queue_logs/r10_status.txt
: > "$STATUS"
echo "$$" > runs/queue_logs/r10.pgid
echo "launch=$(date -u +%F_%H:%M:%S)" >> "$STATUS"
# Same absolute deadline as r9 (03:25 UTC): chip quiet for the driver.
DEADLINE=1787282746

abort_requested() { [ -f .abort_r10 ]; }

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
  timeout "$budget" "$@" > "runs/queue_logs/${name}_r10.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> "$STATUS"
  snapshot_commit "Snapshot judged artifacts after $name (r10 queue)"
}

# Gate: wait for r9 to exit (abort flag set at an item boundary).
for i in $(seq 1 90); do
  kill -0 "$(cat runs/queue_logs/r9.pgid 2>/dev/null)" 2>/dev/null || break
  sleep 60
done
echo "r9 exited $(date -u +%H:%M:%S)" >> "$STATUS"

run shape_transition_s0r5 3300 python -m pde_control_tpu.experiments.run shape_transition \
    --seed 0 --iterations 3500 --num-train 512 \
    --datadir data/shape_transition --resume --workdir runs/shape_transition_s0r5

[ -d runs/shape_transition_s0r5/ckpt_final ] && run generalize_shapes_s0r5 1500 \
    python -m pde_control_tpu.experiments.run generalize_shapes \
    --init-from runs/shape_transition_s0r5/ckpt_final \
    --workdir runs/generalize_shapes_s0r5

[ -d runs/shape_transition_s0r5/ckpt_final ] && run rings_ft 2700 \
    python -m pde_control_tpu.experiments.run shape_transition_rings_ft \
    --init-from runs/shape_transition_s0r5/ckpt_final \
    --workdir runs/shape_transition_rings_ft

[ -d runs/shape_transition_rings_ft/ckpt_final ] && run generalize_shapes_ringsft 1500 \
    python -m pde_control_tpu.experiments.run generalize_shapes \
    --init-from runs/shape_transition_rings_ft/ckpt_final \
    --workdir runs/generalize_shapes_ringsft

run natural_flow_128_refined 5400 python -m pde_control_tpu.experiments.run natural_flow_128 \
    --sequence refined --datadir data/natural_flow --resume \
    --workdir runs/natural_flow_128_refined

run adjoint64_lr002 2400 python scripts/adjoint64_lr.py 0.02

snapshot_commit "Snapshot judged artifacts at r10 queue completion"
echo ALL_DONE $(date -u +%H:%M:%S) >> "$STATUS"
