#!/bin/bash
# Third queue stage: longer/larger smoke_indirect push (waits for the
# quality2 queue, including the full-size smoke3d run, to finish).
cd /root/repo
while ! grep -q SMOKE3D_DONE runs/queue_logs/quality2_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/quality3_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality3_status.txt
  timeout 10800 "$@" > "runs/queue_logs/${name}_q3.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality3_status.txt
}
run smoke_indirect python -m pde_control_tpu.experiments.run smoke_indirect \
    --iterations 4000 --num-train 512 --workdir runs/smoke_indirect
echo ALL_DONE >> runs/queue_logs/quality3_status.txt
