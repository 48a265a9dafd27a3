#!/bin/bash
# Round-3 queue B (waits for queue A): multi-seed spread for configs 3-4
# (VERDICT r2 item 4 — mean ± std over >=3 training seeds; seed 0 is the
# round-2 full run, re-run here under the identical protocol for a clean
# triple), then the 128^2 stretch config (item 8).
cd /root/repo
while ! grep -q ALL_DONE runs/queue_logs/r3a_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/r3b_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3b_status.txt
  timeout 10800 "$@" > "runs/queue_logs/${name}_r3b.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3b_status.txt
}
for seed in 1 2; do
  run shape_transition_s${seed} python -m pde_control_tpu.experiments.run shape_transition \
      --iterations 3500 --num-train 512 --seed ${seed} \
      --datadir data/shape_transition \
      --workdir runs/shape_transition_s${seed}
  run smoke_indirect_s${seed} python -m pde_control_tpu.experiments.run smoke_indirect \
      --iterations 4000 --e2e-iterations 8000 --num-train 512 --seed ${seed} \
      --datadir data/smoke_indirect \
      --workdir runs/smoke_indirect_s${seed}
done
run smoke_128 python -m pde_control_tpu.experiments.run smoke_128 \
    --iterations 2000 --e2e-iterations 3000 --num-train 256 \
    --datadir data/smoke_128 --workdir runs/smoke_128
echo ALL_DONE >> runs/queue_logs/r3b_status.txt
