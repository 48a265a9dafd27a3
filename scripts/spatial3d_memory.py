"""Per-device memory scaling of the 3D spatial decomposition (VERDICT r4
item 5): XLA memory_analysis of the SAME 128³ rollout+backprop program at
space=8 vs space=1 (compile-only — no arrays are materialized). The 3D
family is where memory pressure is worst (working set ~N³): this is the
evidence that parallel/spatial3d.py turns the repo's strongest
beyond-reference result (3D indirect control) from single-device-bounded
into scale-bearing.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/spatial3d_memory.py [--size 128] [--n 4]
Writes runs/spatial3d_memory/results.json.
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
from jax import lax

from pde_control_tpu.control.sequences import REMAT_POLICY
from pde_control_tpu.grids3d import Staggered3D, Domain3D
from pde_control_tpu.parallel.spatial import make_mesh2d
from pde_control_tpu.parallel.spatial3d import spatial_fluid3d_step
from pde_control_tpu.physics.fluid3d import Fluid3DConfig, FluidState3D
from pde_control_tpu.utils.epoch import stamp


def analyze(size: int, n: int, n_space: int) -> dict:
    mesh = make_mesh2d(1, n_space)
    domain = Domain3D.create(size, size, size)
    cfg = Fluid3DConfig(dt=0.5, buoyancy=0.05, pressure_tol=1e-4,
                        pressure_maxiter=100, pressure_backend="spectral")
    rng = np.random.default_rng(0)
    state0 = FluidState3D(
        velocity=Staggered3D.zeros(1, size, size, size),
        density=jnp.asarray(
            rng.uniform(0, 1, (1, size, size, size)).astype(np.float32)))
    target = jnp.asarray(
        rng.uniform(0, 1, (1, size, size, size)).astype(np.float32))
    force = Staggered3D.zeros(1, size, size, size)

    def loss_fn(force):
        def body(s, _):
            return spatial_fluid3d_step(s, domain, cfg, mesh,
                                        force=force), None

        body = jax.checkpoint(body, policy=REMAT_POLICY)
        final, _ = lax.scan(body, state0, None, length=n)
        return jnp.mean((final.density - target) ** 2)

    t0 = time.time()
    mem = jax.jit(jax.grad(loss_fn)).lower(force).compile().memory_analysis()
    return {
        "temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
        "argument_mb": round(mem.argument_size_in_bytes / 2**20, 1),
        "output_mb": round(mem.output_size_in_bytes / 2**20, 1),
        "compile_s": round(time.time() - t0, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--n", type=int, default=4)
    args = ap.parse_args()
    assert len(jax.devices()) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu")
    out = {"size": args.size, "n": args.n,
           "program": "n-step z-sharded rollout + force gradient, "
                      "remat'd scan, exact distributed 3D spectral solve"}
    for n_space in (8, 1):
        out[f"space{n_space}"] = analyze(args.size, args.n, n_space)
        print(json.dumps({f"space{n_space}": out[f"space{n_space}"]}),
              flush=True)
    out["temp_ratio_dense_over_sharded"] = round(
        out["space1"]["temp_mb"] / max(out["space8"]["temp_mb"], 1e-9), 2)
    stamp(out)
    os.makedirs("runs/spatial3d_memory", exist_ok=True)
    with open("runs/spatial3d_memory/results.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"temp_ratio_dense_over_sharded":
                      out["temp_ratio_dense_over_sharded"]}), flush=True)
    print("WROTE runs/spatial3d_memory/results.json", flush=True)


if __name__ == "__main__":
    main()
