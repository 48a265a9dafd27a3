#!/bin/bash
# Round-3 queue E (waits for queue D): refresh the Burgers scheme table
# under the round-3 eval rigor (full val set, per-sample spread).
cd /root/repo
while ! grep -q ALL_DONE runs/queue_logs/r3d_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/r3e_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3e_status.txt
  timeout 10800 "$@" > "runs/queue_logs/${name}_r3e.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3e_status.txt
}
run compare_burgers python -m pde_control_tpu.experiments.run compare_burgers \
    --workdir runs/compare_burgers_r3
echo ALL_DONE >> runs/queue_logs/r3e_status.txt
