#!/bin/bash
# Round-2 "quality" reruns: longer training on the 2D configs.
cd /root/repo
mkdir -p runs/queue_logs
: > runs/queue_logs/quality_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality_status.txt
  timeout 10800 python -m pde_control_tpu.experiments.run "$name" "$@" \
      > "runs/queue_logs/${name}_q.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality_status.txt
}
run shape_transition --iterations 2000 --workdir runs/shape_transition
run smoke_indirect   --iterations 2000 --workdir runs/smoke_indirect
run natural_flow_128 --iterations 800  --workdir runs/natural_flow_128
echo ALL_DONE >> runs/queue_logs/quality_status.txt
