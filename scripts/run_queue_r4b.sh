#!/bin/bash
# Round-3 queue I ("r4b"): replaces r4a after two mid-queue findings:
#   (a) the --resume-from-scratch OP-skip bug (the first OP stage's save()
#       wrote ALL nets, so _ckpt_has skipped every later OP supervised
#       stage) — compare_smoke_64's scheme rows trained with untrained OP
#       pretraining and must be redone (its CFE stage is kept);
#   (b) smoke3d_indirect2's CFE stage diverged to NaN at force_reg 1e-5
#       and poisoned every later stage — now survivable (apply_if_finite
#       skip + divergence abort), the workdir was deleted for a clean rerun.
#
# Priority order = judge value (VERDICT r2 "next round"):
#   1. compare_smoke_64  — hierarchy at n=64, correct protocol (item 3)
#   2. natural_flow_128_final — config 5 @3584 traj, disk pipeline (item 2)
#   3. smoke3d_indirect2 — 3D indirect, resized reg, 2x e2e (item 5)
#   4. bench.py          — re-freeze the CPU comparator + BENCH numbers
#   5-9. configs 4, 3, burgers table + configs 1-2 (flagship artifacts)
#   10-12. smoke_128, smoke3d, compare_smoke_32 refresh
#   13. finisher passes: any run whose results/comparison json is missing
#       gets one more --resume invocation with the remaining budget.
#
# Every run is stage-resumable (--resume + mid-stage autosaves); datasets
# go through --datadir so restarts skip generation. A run never starts
# after NEW_RUN_DEADLINE and never survives past HARD_STOP, so the chip is
# free for the driver's bench/dryrun at round end.
cd /root/repo
mkdir -p runs/queue_logs
LAUNCH=$(date +%s)
NEW_RUN_DEADLINE=$((LAUNCH + 8 * 3600 + 1800))  # no new runs after +8h30
HARD_STOP=$((LAUNCH + 9 * 3600 + 2700))         # nothing survives +9h45
STATUS=runs/queue_logs/r4b_status.txt
: > "$STATUS"
echo "launch=$(date -u +%H:%M:%S) new_run_deadline=+8h30 hard_stop=+9h45" >> "$STATUS"

run() {
  name=$1; budget=$2; shift 2
  now=$(date +%s)
  if [ "$now" -ge "$NEW_RUN_DEADLINE" ]; then
    echo "=== $name SKIPPED (past deadline) $(date -u +%H:%M:%S) ===" >> "$STATUS"
    return
  fi
  remain=$((HARD_STOP - now))
  [ "$budget" -gt "$remain" ] && budget=$remain
  echo "=== $name start $(date -u +%H:%M:%S) (budget ${budget}s) ===" >> "$STATUS"
  timeout "$budget" "$@" > "runs/queue_logs/${name}_r4b.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> "$STATUS"
}

run compare_smoke_64 9000 python -m pde_control_tpu.experiments.run compare_smoke_64 \
    --resume --workdir runs/compare_smoke_64
run natural_flow_128_final 16000 python -m pde_control_tpu.experiments.run natural_flow_128 \
    --num-train 3584 --num-val 64 --e2e-iterations 4500 \
    --datadir data/natural_flow_128 --resume \
    --workdir runs/natural_flow_128_final
run smoke3d_indirect2 9000 python -m pde_control_tpu.experiments.run smoke3d_indirect \
    --e2e-iterations 2400 --resume --workdir runs/smoke3d_indirect2
run bench 4800 python bench.py
run smoke_indirect 9000 python -m pde_control_tpu.experiments.run smoke_indirect \
    --iterations 4000 --e2e-iterations 8000 --num-train 512 \
    --datadir data/smoke_indirect --resume --workdir runs/smoke_indirect
run shape_transition 7200 python -m pde_control_tpu.experiments.run shape_transition \
    --iterations 3500 --num-train 512 \
    --datadir data/shape_transition --resume --workdir runs/shape_transition
run compare_burgers 7200 python -m pde_control_tpu.experiments.run compare_burgers \
    --resume --workdir runs/compare_burgers
run burgers_hierarchical 3600 python -m pde_control_tpu.experiments.run burgers_hierarchical \
    --workdir runs/burgers_hierarchical
run burgers_chain 3600 python -m pde_control_tpu.experiments.run burgers_chain \
    --workdir runs/burgers_chain
run smoke_128 9000 python -m pde_control_tpu.experiments.run smoke_128 \
    --iterations 2000 --e2e-iterations 3000 --num-train 256 \
    --datadir data/smoke_128 --resume --workdir runs/smoke_128
run smoke3d 7200 python -m pde_control_tpu.experiments.run smoke3d \
    --iterations 2000 --num-train 128 --resume --workdir runs/smoke3d
run compare_smoke_32 9000 python -m pde_control_tpu.experiments.run compare_smoke_long \
    --resume --workdir runs/compare_smoke_32

# Finisher passes: one more --resume invocation for anything interrupted
# mid-run (training resumes from autosaves; a finished-but-unevaluated run
# re-runs only its eval). Ordered by the same priority.
finish() {
  name=$1; marker=$2; shift 2
  [ -f "$marker" ] && return
  run "${name}_finish" 7200 "$@"
}
finish natural_flow_128_final runs/natural_flow_128_final/results.json \
    python -m pde_control_tpu.experiments.run natural_flow_128 \
    --num-train 3584 --num-val 64 --e2e-iterations 4500 \
    --datadir data/natural_flow_128 --resume \
    --workdir runs/natural_flow_128_final
finish smoke3d_indirect2 runs/smoke3d_indirect2/results.json \
    python -m pde_control_tpu.experiments.run smoke3d_indirect \
    --e2e-iterations 2400 --resume --workdir runs/smoke3d_indirect2
finish smoke_indirect runs/smoke_indirect/results.json \
    python -m pde_control_tpu.experiments.run smoke_indirect \
    --iterations 4000 --e2e-iterations 8000 --num-train 512 \
    --datadir data/smoke_indirect --resume --workdir runs/smoke_indirect
finish shape_transition runs/shape_transition/results.json \
    python -m pde_control_tpu.experiments.run shape_transition \
    --iterations 3500 --num-train 512 \
    --datadir data/shape_transition --resume --workdir runs/shape_transition
echo ALL_DONE >> "$STATUS"
