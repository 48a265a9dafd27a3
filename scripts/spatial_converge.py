"""Spatially-sharded force optimization run to CONVERGENCE (VERDICT r4
weak #2 / next #6): the round-4 spatial consumers only ever ran as
mechanism demos (0.16-0.02% improvement), because the demo targets were
CFL-UNREACHABLE — spatial_scaling's 512² target asks the blob to travel
0.25·size ≈ 128 cells in 8 steps (16 cells/step) while shift-advection
clips displacement at max_shift=2 cells/step, so the loss gradient is flat
almost everywhere. This run poses a REACHABLE task (8-cell shift ≈ 1
cell/step) on the same 512² grid / 8-device spatial mesh and optimizes
until the controlled final MSE beats the zero-force baseline by >= 2x.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/spatial_converge.py [--size 512] [--iterations 100]
Writes runs/spatial_converge/results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: F401  (persistent compile cache)

import numpy as np

import jax
import jax.numpy as jnp

from pde_control_tpu.grids import Domain2D, Staggered2D
from pde_control_tpu.parallel.spatial import make_mesh2d
from pde_control_tpu.parallel.spatial_opt import optimize_forces_spatial
from pde_control_tpu.physics.fluid import FluidConfig, FluidState
from pde_control_tpu.utils.epoch import stamp


def _blob(size: int, cy: float, cx: float,
          sigma_cells: float | None = None) -> np.ndarray:
    """Gaussian blob. Default width scales with the domain (sigma ≈
    0.032·size, the spatial_scaling demo's convention); sigma_cells pins
    the width in CELLS instead — the resolution-scaling setup, where the
    same physical blob/shift task is solved on a finer grid. The
    distinction decides reachability: the CFL envelope caps the shift at
    n·max_shift·dt ≈ 8 cells, so a domain-scaled blob at 512² (sigma 16
    cells) turns the max reachable shift into a sub-sigma displacement
    with a shallow loss landscape (measured: converges to 1.29x), while
    a cell-pinned blob keeps shift/sigma — and the optimization — the
    same as at 128²."""
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    denom = (2.0 * sigma_cells * sigma_cells if sigma_cells
             else 0.002 * size * size)
    return np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                  / denom).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.5)
    ap.add_argument("--force-reg", type=float, default=1e-9,
                    help="effort penalty; effort is an UNNORMALIZED "
                    "sum over steps+faces (O(1e4) at transport-scale "
                    "forces), so the spatial_scaling demos' 1e-4/1e-5 "
                    "made the reg term dominate the O(1e-3) obs loss "
                    "and froze the optimization near zero force")
    ap.add_argument("--shift-cells", type=float, default=8.0,
                    help="target displacement in cells; keep under "
                    "n*max_shift*dt/dx (the CFL-reachable envelope)")
    ap.add_argument("--blob-sigma-cells", type=float, default=None,
                    help="pin the blob width in cells (resolution-"
                    "scaling setup: same physical task on a finer "
                    "sharded grid); default scales sigma with the "
                    "domain (the harder, envelope-limited task)")
    ap.add_argument("--out", default="runs/spatial_converge",
                    help="output directory for results.json")
    args = ap.parse_args()
    assert len(jax.devices()) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu")
    size, n = args.size, args.n
    mesh = make_mesh2d(1, 8)
    obstacle = np.zeros((size, size), np.float32)
    obstacle[size // 2, size // 4: size // 2] = 1.0
    domain = Domain2D.create(size, size, obstacle_mask=jnp.asarray(obstacle))
    cfg = FluidConfig(dt=0.5, buoyancy=0.0, pressure_tol=1e-4,
                      pressure_maxiter=300, pressure_backend="pcg")
    cy, cx = size * 0.3, size * 0.5
    sig = args.blob_sigma_cells
    state0 = FluidState(velocity=Staggered2D.zeros(1, size, size),
                        density=jnp.asarray(_blob(size, cy, cx, sig))[None])
    target = jnp.asarray(_blob(size, cy + args.shift_cells,
                               cx + args.shift_cells, sig))[None]
    t0 = time.time()
    forces, hist = optimize_forces_spatial(
        state0, target, domain, cfg, mesh, n=n,
        iterations=args.iterations, learning_rate=args.lr,
        force_reg=args.force_reg, lr_schedule="cosine")
    obs = np.asarray(hist["obs_loss"])
    # zero-force final MSE == obs at iteration 0 (forces start at zero and
    # buoyancy is off, so the uncontrolled rollout leaves the blob static).
    out = {
        "size": size, "n": n, "iterations": args.iterations, "lr": args.lr,
        "force_reg": args.force_reg,
        "shift_cells": args.shift_cells,
        "blob_sigma_cells": sig,
        "mesh": "1x8 spatial (virtual CPU)",
        "zero_force_final_mse": float(obs[0]),
        "controlled_final_mse": float(obs[-1]),
        "improvement": float(obs[0] / max(obs[-1], 1e-30)),
        "curve_every10": [float(x) for x in obs[::10]],
        "wall_s": round(time.time() - t0, 1),
        "forces_vy_sharding": str(forces.vy.sharding.spec),
    }
    stamp(out)
    print(json.dumps(out), flush=True)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    assert out["improvement"] >= 2.0, (
        f"convergence target missed: {out['improvement']:.2f}x < 2x")
    print(f"WROTE {path}", flush=True)


if __name__ == "__main__":
    main()
