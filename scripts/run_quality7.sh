#!/bin/bash
# Seventh queue stage: smoke3d long run (both stages were still descending
# at 600 iters). Waits for quality6.
cd /root/repo
while ! grep -q ALL_DONE runs/queue_logs/quality6_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/quality7_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality7_status.txt
  timeout 10800 "$@" > "runs/queue_logs/${name}_q7.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality7_status.txt
}
run smoke3d python -m pde_control_tpu.experiments.run smoke3d \
    --iterations 2500 --num-train 128 --workdir runs/smoke3d
echo ALL_DONE >> runs/queue_logs/quality7_status.txt
