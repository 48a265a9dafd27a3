"""Render controlled rollouts from a trained experiment checkpoint.

Produces, for a validation sample: the controlled density trajectory strip,
the ground-truth (withheld-forcing) trajectory strip, the zero-force
trajectory strip, and a per-step force-magnitude strip — the visual proof
that the controller steers the plume rather than replaying determinism
(VERDICT r1 items 3-4).

Usage:
    python -m pde_control_tpu.experiments.render_rollout smoke_indirect \
        [--workdir runs/smoke_indirect] [--sample 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def _build(name: str, workdir: str):
    """Rebuild the experiment's PDE + val data + trained app (ckpt_final)."""
    from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE
    from pde_control_tpu.control.training import ControlTraining
    from pde_control_tpu.data.generate import (
        generate_forced_smoke_dataset,
        generate_inflow_smoke_dataset,
    )
    from pde_control_tpu.experiments.fluid2d import default_obstacles
    from pde_control_tpu.grids import Domain2D
    from pde_control_tpu.physics.fluid import FluidConfig

    size, n = 64, 16
    if name == "smoke_indirect":
        obstacles = default_obstacles(size, size)
        domain = Domain2D.create(size, size,
                                 obstacle_mask=jnp.asarray(obstacles))
        cfg = FluidConfig(dt=1.0, buoyancy=0.08, pressure_tol=1e-4,
                          pressure_maxiter=200, warm_start_pressure=True)
        # MUST mirror experiments/fluid2d.py::run_smoke_indirect exactly —
        # the checkpoint's CFE is the wide variant, and the eval data's
        # withheld-control amplitude defines the task.
        val = generate_inflow_smoke_dataset(domain, cfg, 8, n, seed=999,
                                            control_amplitude=1.0)
        pde = IncompressibleFluidPDE(domain, cfg, control="buoyancy",
                                     with_inflow=True, unet_levels=3,
                                     cfe_features=(48, 96, 96, 48))
        obstacle_mask = obstacles
    elif name == "shape_transition":
        domain = Domain2D.create(size, size)
        cfg = FluidConfig(dt=1.0, buoyancy=0.0, pressure_tol=1e-4,
                          pressure_maxiter=200, warm_start_pressure=True)
        val = generate_forced_smoke_dataset(domain, cfg, 8, n, seed=999,
                                            init="shapes")
        pde = IncompressibleFluidPDE(domain, cfg, control="direct",
                                     unet_levels=3)
        obstacle_mask = None
    else:
        raise ValueError(f"no render recipe for {name!r}")

    spans = []
    s = n
    while s >= 2:
        spans.append(s)
        s //= 2
    app = ControlTraining(
        n, pde, batch_size=8,
        trainable_networks=("CFE",) + tuple(f"OP{k}" for k in spans),
        sequence_class="staggered", obs_loss_frames=(n,),
        restore=os.path.join(workdir, "ckpt_final"),
    ).prepare()
    return app, val, n, obstacle_mask


def render(name: str, workdir: str, sample: int = 0, outdir: str | None = None):
    from pde_control_tpu.experiments.curriculum import zero_force_baseline
    from pde_control_tpu.utils.viz import save_trajectory_strip

    app, val, n, obstacles = _build(name, workdir)
    outdir = outdir or os.path.join(workdir, "renders")
    os.makedirs(outdir, exist_ok=True)
    batch = val.sample(np.random.default_rng(7), 8)

    obs_traj, costs, final, states, forces = app.infer_all_frames(
        batch, keep_states=True, keep_forces=True)
    controlled = np.asarray(obs_traj)[:, sample, :, :, 0]     # (n, H, W)
    gt = np.asarray(batch["obs"])[sample, 1:, :, :, 0]

    # zero-force trajectory — the same helper the eval metrics use, so
    # renders cannot drift from evaluate_control's uncontrolled rollout
    natural = zero_force_baseline(app, batch, all_frames=True)[
        :, sample, :, :, 0]

    # force magnitude per step (centered magnitude of the staggered force)
    fy = np.asarray(forces.vy)[:, sample]
    fx = np.asarray(forces.vx)[:, sample]
    fmag = np.sqrt(0.5 * (fy[:, 1:, :] ** 2 + fy[:, :-1, :] ** 2)
                   + 0.5 * (fx[:, :, 1:] ** 2 + fx[:, :, :-1] ** 2))

    def overlay(frames):
        if obstacles is None:
            return frames
        return frames + 1.2 * frames.max() * obstacles[None]

    every = max(1, n // 8)
    save_trajectory_strip(overlay(controlled), f"{outdir}/controlled.png",
                          every=every)
    save_trajectory_strip(overlay(gt), f"{outdir}/ground_truth.png",
                          every=every)
    save_trajectory_strip(overlay(natural), f"{outdir}/zero_force.png",
                          every=every)
    save_trajectory_strip(fmag, f"{outdir}/force_magnitude.png", every=every,
                          cmap="magma")

    ctrl_mse = float(np.mean((controlled[-1] - gt[-1]) ** 2))
    zero_mse = float(np.mean((natural[-1] - gt[-1]) ** 2))
    print(f"sample {sample}: controlled final MSE {ctrl_mse:.3e}, "
          f"zero-force {zero_mse:.3e}, ratio {zero_mse / max(ctrl_mse, 1e-30):.1f}x")
    print(f"renders in {outdir}/")
    return {"controlled_mse": ctrl_mse, "zero_force_mse": zero_mse}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("name", choices=["smoke_indirect", "shape_transition"])
    p.add_argument("--workdir", default=None)
    p.add_argument("--sample", type=int, default=0)
    args = p.parse_args()
    render(args.name, args.workdir or f"runs/{args.name}", args.sample)


if __name__ == "__main__":
    main()
