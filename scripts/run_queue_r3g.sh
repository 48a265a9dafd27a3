#!/bin/bash
# Round-3 queue G: rerun of queues C-F, which died when the axon tunnel
# went down with the previous session at 20:39 (C SIGTERM'd mid-e2e_n64;
# D/E/F failed at backend init with 'axon UNAVAILABLE').
#
# Gate: poll until the TPU answers a real matmul, then run (priority order)
#   1. compare_smoke_64    — hierarchy curve at n=64 (VERDICT r2 item 3)
#   2. smoke3d_indirect2   — 3D indirect, resized force_reg + 2x e2e (item 5)
#   3. natural_flow_128_final --resume — config 5 @3584 traj; skips the
#      already-checkpointed cfe/ops/e2e_n32 stages (item 2)
#   4. compare_burgers     — scheme-table refresh under round-3 eval rigor
cd /root/repo
mkdir -p runs/queue_logs
: > runs/queue_logs/r3g_status.txt
echo "=== waiting for TPU $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3g_status.txt
until timeout 120 python -c "
import __graft_entry__, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]))" \
    >> runs/queue_logs/r3g_probe.log 2>&1; do
  sleep 120
done
echo "=== TPU up $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3g_status.txt
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3g_status.txt
  timeout 12000 "$@" > "runs/queue_logs/${name}_r3g.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S) ===" >> runs/queue_logs/r3g_status.txt
}
run compare_smoke_64 python -m pde_control_tpu.experiments.run compare_smoke_64 \
    --resume --workdir runs/compare_smoke_64
run smoke3d_indirect2 python -m pde_control_tpu.experiments.run smoke3d_indirect \
    --e2e-iterations 3000 --resume --workdir runs/smoke3d_indirect2
run natural_flow_128_final python -m pde_control_tpu.experiments.run natural_flow_128 \
    --num-train 3584 --num-val 64 --e2e-iterations 4500 \
    --datadir data/natural_flow_128 --resume \
    --workdir runs/natural_flow_128_final
run compare_burgers python -m pde_control_tpu.experiments.run compare_burgers \
    --resume --workdir runs/compare_burgers_r3
echo ALL_DONE >> runs/queue_logs/r3g_status.txt
