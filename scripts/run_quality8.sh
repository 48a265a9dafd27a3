#!/bin/bash
# Final queue stage: long-e2e natural_flow push (waits for quality7).
cd /root/repo
while ! grep -q ALL_DONE runs/queue_logs/quality7_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/quality8_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality8_status.txt
  timeout 14400 "$@" > "runs/queue_logs/${name}_q8.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality8_status.txt
}
run natural_flow_128 python -m pde_control_tpu.experiments.run natural_flow_128 \
    --iterations 1000 --e2e-iterations 3000 --num-train 384 \
    --workdir runs/natural_flow_128
echo ALL_DONE >> runs/queue_logs/quality8_status.txt
