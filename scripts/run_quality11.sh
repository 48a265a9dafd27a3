#!/bin/bash
# Final polish: longer training on configs 3-4 (91x / 51x at the previous
# budgets; both train losses were still improving).
cd /root/repo
: > runs/queue_logs/quality11_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality11_status.txt
  timeout 10800 "$@" > "runs/queue_logs/${name}_q11.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality11_status.txt
}
run shape_transition python -m pde_control_tpu.experiments.run shape_transition \
    --iterations 3500 --num-train 512 --workdir runs/shape_transition
run smoke_indirect python -m pde_control_tpu.experiments.run smoke_indirect \
    --iterations 4000 --e2e-iterations 8000 --num-train 512 \
    --workdir runs/smoke_indirect
echo ALL_DONE >> runs/queue_logs/quality11_status.txt
