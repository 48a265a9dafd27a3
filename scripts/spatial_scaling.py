"""Spatial-decomposition scaling study (VERDICT r3 item 1, "make it
load-bearing"): on the 8-device virtual CPU mesh,

  (a) CG iteration counts vs grid size, plain distributed CG ('jax') vs
      the distributed spectral-preconditioned CG ('pcg') — the point of
      the round-4 preconditioner is that iterations STOP scaling with N;
  (b) distributed adjoint force optimization (parallel/spatial_opt.py)
      at --size (default 512²) — a real multi-step rollout+backprop
      consumer; prints the loss curve (must decrease);
  (c) per-device memory from XLA's memory_analysis for the same
      optimization at space=8 vs space=1 (the single-device footprint) —
      the memory-scaling evidence (at 1024²+ the dense program exceeds
      one v5e core's 16 GB HBM share while the sharded one fits).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python scripts/spatial_scaling.py [--size 512]
(drop PALLAS_AXON_POOL_IPS from the env first; see CLAUDE.md).
Writes runs/spatial_scaling/results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Self-sufficient under `python scripts/<name>.py` (the interpreter puts
# scripts/ on sys.path, not the repo root — the r6b queue hit this).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from pde_control_tpu.grids import Domain2D, Staggered2D
from pde_control_tpu.parallel.spatial import (
    make_mesh2d,
    spatial_pressure_solve_diag,
)
from pde_control_tpu.parallel.spatial_opt import optimize_forces_spatial
from pde_control_tpu.physics.fluid import FluidConfig, FluidState


def _obstacle_domain(size: int) -> Domain2D:
    obstacle = np.zeros((size, size), np.float32)
    obstacle[size // 2, size // 4: size // 2] = 1.0  # plate (bench layout)
    return Domain2D.create(size, size, obstacle_mask=jnp.asarray(obstacle))


def _blob(size: int, cy: float, cx: float) -> np.ndarray:
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    return np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                  / (0.002 * size * size)).astype(np.float32)


def iteration_scaling(mesh, sizes, tol=1e-5, maxiter=4000) -> list[dict]:
    rows = []
    for size in sizes:
        domain = _obstacle_domain(size)
        rng = np.random.default_rng(0)
        div = jnp.asarray(rng.normal(0, 1, (1, size, size)).astype(
            np.float32)) * domain.fluid_mask[None]
        row = {"size": size}
        for mode in ("jax", "pcg", "pcg2"):
            t0 = time.time()
            p, iters = jax.jit(
                spatial_pressure_solve_diag,
                static_argnames=("mesh", "mode", "tol", "maxiter"))(
                    div, domain, mesh=mesh, mode=mode, tol=tol,
                    maxiter=maxiter)
            row[f"iters_{mode}"] = int(iters)
            row[f"wall_s_{mode}"] = round(time.time() - t0, 2)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def adjoint_demo(mesh, size, n=8, iterations=30) -> dict:
    domain = _obstacle_domain(size)
    state0 = FluidState(
        velocity=Staggered2D.zeros(1, size, size),
        density=jnp.asarray(_blob(size, size * 0.3, size * 0.5))[None])
    target = jnp.asarray(_blob(size, size * 0.55, size * 0.55))[None]
    cfg = FluidConfig(dt=0.5, buoyancy=0.0, pressure_tol=1e-4,
                      pressure_maxiter=300, pressure_backend="pcg")
    t0 = time.time()
    forces, hist = optimize_forces_spatial(
        state0, target, domain, cfg, mesh, n=n, iterations=iterations,
        learning_rate=0.2, force_reg=1e-4)
    obs = np.asarray(hist["obs_loss"])
    out = {
        "size": size, "n": n, "iterations": iterations,
        "obs_loss_first": float(obs[0]), "obs_loss_last": float(obs[-1]),
        "improvement": float(obs[0] / max(obs[-1], 1e-30)),
        "wall_s": round(time.time() - t0, 1),
        "forces_vy_sharding": str(forces.vy.sharding.spec),
    }
    print(json.dumps(out), flush=True)
    assert obs[-1] < obs[0], "adjoint optimization failed to improve"
    return out


def memory_analysis(size, n=8, iterations=2) -> dict:
    """Per-device memory of the SAME adjoint program, space=8 vs space=1
    (compile-only: .lower().compile().memory_analysis())."""
    out = {"size": size, "n": n}
    for n_space in (8, 1):
        mesh = make_mesh2d(1, n_space)
        domain = _obstacle_domain(size)
        state0 = FluidState(
            velocity=Staggered2D.zeros(1, size, size),
            density=jnp.asarray(_blob(size, size * 0.3, size * 0.5))[None])
        target = jnp.asarray(_blob(size, size * 0.55, size * 0.55))[None]
        cfg = FluidConfig(dt=0.5, buoyancy=0.0, pressure_tol=1e-4,
                          pressure_maxiter=300, pressure_backend="pcg")
        # Reuse optimize_forces_spatial's jitted runner via its history
        # handles — but compile-only, so build the runner without running:
        from pde_control_tpu.parallel.spatial_opt import (
            force_shardings,
            spatial_rollout,
        )
        import optax
        from jax import lax

        b, h, w = state0.density.shape
        shd = force_shardings(mesh)
        forces0 = Staggered2D(
            vy=jax.device_put(jnp.zeros((n, b, h + 1, w), jnp.float32),
                              shd.vy),
            vx=jax.device_put(jnp.zeros((n, b, h, w + 1), jnp.float32),
                              shd.vx))
        dx2 = domain.dx * domain.dx
        optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                                optax.adam(0.2))

        def rollout_loss(forces):
            final = spatial_rollout(state0, domain, cfg, mesh,
                                    forces=forces)
            obs = jnp.mean((final.density - target) ** 2)
            effort = dx2 * jnp.mean(
                jnp.sum(forces.vy ** 2, axis=(0, 2, 3))
                + jnp.sum(forces.vx ** 2, axis=(0, 2, 3)))
            return obs + 1e-4 * effort

        def opt_step(carry, _):
            forces, opt_state = carry
            _, grads = jax.value_and_grad(rollout_loss)(forces)
            updates, opt_state = optimizer.update(grads, opt_state)
            return (optax.apply_updates(forces, updates), opt_state), None

        def run(forces0):
            opt_state = optimizer.init(forces0)
            (forces, _), _ = lax.scan(opt_step, (forces0, opt_state), None,
                                      length=iterations)
            return forces

        t0 = time.time()
        mem = jax.jit(run).lower(forces0).compile().memory_analysis()
        key = f"space{n_space}"
        out[key] = {
            "temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
            "argument_mb": round(mem.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(mem.output_size_in_bytes / 2**20, 1),
            "compile_s": round(time.time() - t0, 1),
        }
        print(json.dumps({key: out[key], "size": size}), flush=True)
    s8, s1 = out["space8"], out["space1"]
    out["temp_ratio_dense_over_sharded"] = round(
        s1["temp_mb"] / max(s8["temp_mb"], 1e-9), 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512,
                    help="adjoint-demo grid size")
    ap.add_argument("--mem-size", type=int, default=1024,
                    help="memory-analysis grid size (compile-only)")
    ap.add_argument("--sizes", default="128,256,512",
                    help="iteration-scaling grid sizes")
    ap.add_argument("--iterations", type=int, default=30)
    args = ap.parse_args()
    assert len(jax.devices()) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu")
    mesh = make_mesh2d(1, 8)
    results = {"platform": jax.devices()[0].platform}
    results["iteration_scaling"] = iteration_scaling(
        mesh, [int(s) for s in args.sizes.split(",")])
    results["adjoint_demo"] = adjoint_demo(mesh, args.size,
                                           iterations=args.iterations)
    results["memory"] = memory_analysis(args.mem_size)
    os.makedirs("runs/spatial_scaling", exist_ok=True)
    with open("runs/spatial_scaling/results.json", "w") as f:
        json.dump(results, f, indent=2)
    print("WROTE runs/spatial_scaling/results.json", flush=True)


if __name__ == "__main__":
    main()
