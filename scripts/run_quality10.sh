#!/bin/bash
# Tenth queue stage: smoke3d with CFL-safe forcing + clipped e2e.
cd /root/repo
while ! grep -q ALL_DONE runs/queue_logs/quality9_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/quality10_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality10_status.txt
  timeout 10800 "$@" > "runs/queue_logs/${name}_q10.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality10_status.txt
}
run smoke3d python -m pde_control_tpu.experiments.run smoke3d \
    --iterations 2000 --num-train 128 --workdir runs/smoke3d
echo ALL_DONE >> runs/queue_logs/quality10_status.txt
