#!/bin/bash
# Follow-on queue: waits for run_quality.sh to finish, then reruns the
# smoke scheme comparison with the fixed force_reg + longer training, and
# re-measures bench.py (warm-start path) best-of-3.
cd /root/repo
while ! grep -q ALL_DONE runs/queue_logs/quality_status.txt 2>/dev/null; do
  sleep 60
done
: > runs/queue_logs/quality2_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality2_status.txt
  timeout 10800 "$@" > "runs/queue_logs/${name}_q2.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/quality2_status.txt
}
run compare_smoke python -m pde_control_tpu.experiments.run compare_smoke \
    --iterations 1500 --workdir runs/compare_smoke
run bench python bench.py
echo ALL_DONE >> runs/queue_logs/quality2_status.txt
run smoke3d python -m pde_control_tpu.experiments.run smoke3d \
    --workdir runs/smoke3d
echo SMOKE3D_DONE >> runs/queue_logs/quality2_status.txt
