#!/bin/bash
# Round-3 queue A (serial: one TPU chip):
#  1. config 5 at 2048 trajectories through the disk pipeline (VERDICT r2
#     item 2: close the val gap; native loader on the production path)
#  2. smoke hierarchy comparison at n=32 (item 3)
#  3. 3D indirect control at 32^3 with obstacles + inflow (item 5)
cd /root/repo
mkdir -p runs/queue_logs
: > runs/queue_logs/r3a_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3a_status.txt
  timeout 16000 "$@" > "runs/queue_logs/${name}_r3a.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3a_status.txt
}
run natural_flow_128 python -m pde_control_tpu.experiments.run natural_flow_128 \
    --num-train 2048 --e2e-iterations 3000 --datadir data/natural_flow_128 \
    --workdir runs/natural_flow_128_r3
run compare_smoke_long python -m pde_control_tpu.experiments.run compare_smoke_long \
    --workdir runs/compare_smoke_32
run smoke3d_indirect python -m pde_control_tpu.experiments.run smoke3d_indirect \
    --e2e-iterations 1500 --workdir runs/smoke3d_indirect
echo ALL_DONE >> runs/queue_logs/r3a_status.txt
