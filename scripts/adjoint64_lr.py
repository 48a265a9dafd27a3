"""Fairness check for the n=64 adjoint row (round 4): the queue row ran
at the n=32 table's lr 0.5 and collapsed with |F| ≈ 2.4 — is the collapse
the method or the step size? Re-run the identical microbatched protocol
at lower learning rates; report each. (The row in comparison.json stays
the protocol-matched lr 0.5 one; this prints the lr sensitivity for the
RESULTS footnote.)

Usage: python scripts/adjoint64_lr.py [lr1,lr2,...] [iterations]
(defaults 0.1, 300 — the table protocol; pass a larger budget for the
iteration-budget point of the collapse curve)
"""
import json
import os
import sys

# Self-sufficient under `python scripts/<name>.py` (the interpreter puts
# scripts/ on sys.path, not the repo root — the r6b queue hit this).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import __graft_entry__  # noqa: F401  (compile cache)
import jax
import jax.numpy as jnp

from pde_control_tpu.control.adjoint import optimize_forces
from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE
from pde_control_tpu.data.generate import generate_inflow_smoke_dataset
from pde_control_tpu.experiments.fluid2d import default_obstacles
from pde_control_tpu.grids import Domain2D
from pde_control_tpu.physics.fluid import FluidConfig

SIZE, N, MB, ITERS, FORCE_REG = 64, 64, 4, 300, 3e-4

if __name__ == "__main__":
    lrs = ([float(x) for x in sys.argv[1].split(",")]
           if len(sys.argv) > 1 else [0.1])
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else ITERS
    obstacles = default_obstacles(SIZE, SIZE)
    domain = Domain2D.create(SIZE, SIZE, obstacle_mask=jnp.asarray(obstacles))
    cfg = FluidConfig(dt=1.0, buoyancy=0.08, pressure_tol=1e-4,
                      pressure_maxiter=200, warm_start_pressure=True)
    # Same val data as compare_smoke_64 (seed 999, amplitude 0.15) and the
    # same deterministic 32-trajectory prefix the table rows score.
    val = generate_inflow_smoke_dataset(domain, cfg, 32, N, seed=999,
                                        control_amplitude=0.15)
    batch = val.take(np.arange(32))
    pde = IncompressibleFluidPDE(domain, cfg, control="buoyancy",
                                 with_inflow=True, unet_levels=3)
    for lr in lrs:
        mses, forces_abs = [], []
        for lo in range(0, 32, MB):
            part = {k: v[lo:lo + MB] for k, v in batch.items()}
            state0 = jax.jit(pde.initial_state)(part)
            target = jnp.asarray(part["obs"][:, N])
            forces, hist = optimize_forces(
                pde, state0, target, n=N, iterations=iters,
                learning_rate=lr, force_reg=FORCE_REG)
            mses.append(float(np.asarray(hist["obs_loss"])[-1]))
            forces_abs.append(float(np.mean(np.asarray(
                jax.vmap(pde.force_abs_mean)(forces)))))
        row = {"lr": lr,
               "final_state_mse": float(np.mean(mses)),
               "mse_sem": float(np.std(mses)
                                / max(len(mses) - 1, 1) ** .5),
               "mean_abs_force": float(np.mean(forces_abs)),
               "iterations": iters, "microbatch": MB}
        print(json.dumps(row), flush=True)
        # Land the point in the judged artifact directly (the queue runs
        # this unattended; round 4's row was assembled by hand).
        res_path = "runs/adjoint64_lr/results.json"
        os.makedirs(os.path.dirname(res_path), exist_ok=True)
        try:
            with open(res_path) as f:
                res = json.load(f)
        except (OSError, json.JSONDecodeError):
            res = {"entry": "adjoint64_lr",
                   "protocol": "compare_smoke_64 adjoint row protocol "
                               "(microbatch 4, force_reg 3e-4), lr sweep",
                   "rows": []}
        res["rows"] = [r for r in res.get("rows", [])
                       if not (r["lr"] == row["lr"]
                               and r["iterations"] == row["iterations"])]
        res["rows"].append(row)
        res["rows"].sort(key=lambda r: (r["lr"], r["iterations"]))
        from pde_control_tpu.utils.epoch import stamp

        res.pop("vm_epoch", None)
        stamp(res)
        with open(res_path, "w") as f:
            json.dump(res, f, indent=2)
