#!/bin/bash
# Ninth queue stage: re-run configs 3-4 with the re-sized force regularizer
# (the reg term was still ~half the converged e2e loss at the old values).
# Waits for quality8.
cd /root/repo
while ! grep -q ALL_DONE runs/queue_logs/quality8_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/quality9_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality9_status.txt
  timeout 10800 "$@" > "runs/queue_logs/${name}_q9.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality9_status.txt
}
run shape_transition python -m pde_control_tpu.experiments.run shape_transition \
    --iterations 2000 --workdir runs/shape_transition
run smoke_indirect python -m pde_control_tpu.experiments.run smoke_indirect \
    --iterations 4000 --num-train 512 --workdir runs/smoke_indirect
echo ALL_DONE >> runs/queue_logs/quality9_status.txt
