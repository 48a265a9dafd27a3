#!/bin/bash
# Round-3 queue D (waits for queue C): the hierarchy comparison at n=64
# (the gap grew 1.5% -> 1.74x from n=16 -> 32; extend the curve).
cd /root/repo
while ! grep -q ALL_DONE runs/queue_logs/r3c_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/r3d_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3d_status.txt
  timeout 10800 "$@" > "runs/queue_logs/${name}_r3d.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3d_status.txt
}
run compare_smoke_64 python -m pde_control_tpu.experiments.run compare_smoke_64 \
    --workdir runs/compare_smoke_64
echo ALL_DONE >> runs/queue_logs/r3d_status.txt
