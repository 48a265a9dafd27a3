#!/bin/bash
# Round-3 queue F (waits for queue E): the 3D indirect rerun — force_reg
# resized from the measured reg/obs split (58% of loss at 3e-5 -> 1e-5)
# and a 2x e2e budget; first run reached 6.9x over zero force, target
# >=10x (VERDICT r2 item 5).
cd /root/repo
while ! grep -q ALL_DONE runs/queue_logs/r3e_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/r3f_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3f_status.txt
  timeout 12000 "$@" > "runs/queue_logs/${name}_r3f.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3f_status.txt
}
run smoke3d_indirect2 python -m pde_control_tpu.experiments.run smoke3d_indirect \
    --e2e-iterations 3000 --workdir runs/smoke3d_indirect2
echo ALL_DONE >> runs/queue_logs/r3f_status.txt
