#!/bin/bash
# Round-3 queue C (waits for queue B): the config-5 final push — 3584
# trajectories (the largest set that stays device-resident at fp16 under
# the 4 GB DeviceDataset budget), longer n=128 e2e, and a 64-sample val
# set so the <=2e-3 target is measured above its own noise floor
# (the 2048-run val sem was 3.4e-4 on 16 samples).
cd /root/repo
while ! grep -q ALL_DONE runs/queue_logs/r3b_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/r3c_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3c_status.txt
  timeout 16000 "$@" > "runs/queue_logs/${name}_r3c.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3c_status.txt
}
run natural_flow_128_final python -m pde_control_tpu.experiments.run natural_flow_128 \
    --num-train 3584 --num-val 64 --e2e-iterations 4500 \
    --datadir data/natural_flow_128 \
    --workdir runs/natural_flow_128_final
echo ALL_DONE >> runs/queue_logs/r3c_status.txt
