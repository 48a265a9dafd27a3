#!/bin/bash
# Round-2 full-size experiment queue (serial: one TPU chip).
# Logs to runs/queue_logs/<name>.log; exit codes to runs/queue_logs/status.txt
cd /root/repo
mkdir -p runs/queue_logs
: > runs/queue_logs/status.txt
for name in shape_transition smoke_indirect natural_flow_128 compare_burgers compare_smoke; do
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/status.txt
  timeout 7200 python -m pde_control_tpu.experiments.run "$name" \
      > "runs/queue_logs/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/status.txt
done
echo ALL_DONE >> runs/queue_logs/status.txt
