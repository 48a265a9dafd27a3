#!/bin/bash
# Round-4 queue A: VERDICT r3 items in judge-value order —
#   1. adjoint row at n=64 (item 3): microbatched (4 traj/program) fill of
#      the skipped comparison row, --resume so nothing else retrains.
#   2-3. shape_transition / smoke_indirect seed 1 (item 5): re-earn the
#      multi-seed spreads the VM resets wiped; checkpoints double as the
#      generalization-eval inputs (item 4).
#   4. smoke_indirect width-2 (item 2): the MXU-fill Pareto run — 4x net
#      FLOPs at +27% measured iteration cost, same data/protocol.
#   5-6. seed 2 for both configs (budget permitting).
# Deadline discipline: no new run after NEW_RUN_DEADLINE, nothing survives
# HARD_STOP (the driver's round-end bench needs a free chip).
cd /root/repo
mkdir -p runs/queue_logs
LAUNCH=$(date +%s)
NEW_RUN_DEADLINE=$((LAUNCH + 3 * 3600 + 3300))  # +3h55
HARD_STOP=$((LAUNCH + 4 * 3600 + 2700))         # +4h45
STATUS=runs/queue_logs/r5a_status.txt
: > "$STATUS"
echo "launch=$(date -u +%H:%M:%S) new_run_deadline=+3h55 hard_stop=+4h45" >> "$STATUS"

# Chip probe gate: do not start multi-hour runs into a wedged tunnel.
for i in $(seq 1 30); do
  timeout 420 python -c "
import jax, jax.numpy as jnp
a = jnp.ones((512, 512), jnp.bfloat16)
print(float((a @ a)[0, 0]))" >/dev/null 2>&1 && break
  echo "probe $i failed $(date -u +%H:%M:%S)" >> "$STATUS"
  sleep 120
done
echo "probe ok $(date -u +%H:%M:%S)" >> "$STATUS"

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
  timeout "$budget" "$@" > "runs/queue_logs/${name}_r5a.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> "$STATUS"
}

run adjoint64 5400 python -m pde_control_tpu.experiments.run compare_smoke_64 \
    --resume --workdir runs/compare_smoke_64
run shape_transition_s1 6600 python -m pde_control_tpu.experiments.run shape_transition \
    --seed 1 --iterations 3500 --num-train 512 \
    --datadir data/shape_transition --resume --workdir runs/shape_transition_s1
run smoke_indirect_s1 8400 python -m pde_control_tpu.experiments.run smoke_indirect \
    --seed 1 --iterations 4000 --e2e-iterations 8000 --num-train 512 \
    --datadir data/smoke_indirect --resume --workdir runs/smoke_indirect_s1
run smoke_indirect_w2 9600 python -m pde_control_tpu.experiments.run smoke_indirect \
    --width 2 --iterations 4000 --e2e-iterations 8000 --num-train 512 \
    --datadir data/smoke_indirect --resume --workdir runs/smoke_indirect_w2
run shape_transition_s2 6600 python -m pde_control_tpu.experiments.run shape_transition \
    --seed 2 --iterations 3500 --num-train 512 \
    --datadir data/shape_transition --resume --workdir runs/shape_transition_s2
run smoke_indirect_s2 8400 python -m pde_control_tpu.experiments.run smoke_indirect \
    --seed 2 --iterations 4000 --e2e-iterations 8000 --num-train 512 \
    --datadir data/smoke_indirect --resume --workdir runs/smoke_indirect_s2
echo ALL_DONE >> "$STATUS"
