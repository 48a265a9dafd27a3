#!/bin/bash
# Sixth queue stage: smoke_indirect repair rerun (the wide-CFE e2e diverged
# without grad clipping and overwrote the good checkpoint). Waits for
# quality5.
cd /root/repo
while ! grep -q ALL_DONE runs/queue_logs/quality5_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/quality6_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality6_status.txt
  timeout 10800 "$@" > "runs/queue_logs/${name}_q6.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality6_status.txt
}
run smoke_indirect python -m pde_control_tpu.experiments.run smoke_indirect \
    --iterations 4000 --num-train 512 --workdir runs/smoke_indirect
echo ALL_DONE >> runs/queue_logs/quality6_status.txt
