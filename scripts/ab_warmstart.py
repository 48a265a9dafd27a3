"""A/B the pressure warm start on the bench iteration (TPU).

Same measurement protocol as bench.py (fused 8-step programs, device-resident
batches, best-of-3), with FluidConfig.warm_start_pressure off/on.
"""
import json
import time

import numpy as np

import jax

import __graft_entry__  # noqa: F401  (enables the compile cache)
from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE
from pde_control_tpu.control.training import ControlTraining
from pde_control_tpu.grids import Domain2D
from pde_control_tpu.physics.fluid import FluidConfig

H, N, B, ITERS = 64, 16, 8, 8


def make_app(warm: bool):
    import jax.numpy as jnp

    obstacle = np.zeros((H, H), np.float32)
    obstacle[H // 2, H // 4: H // 2] = 1.0
    domain = Domain2D.create(H, H, obstacle_mask=jnp.asarray(obstacle))
    cfg = FluidConfig(dt=1.0, buoyancy=0.08, pressure_tol=1e-4,
                      pressure_maxiter=100, warm_start_pressure=warm)
    spans = []
    n = N
    while n >= 2:
        spans.append(n)
        n //= 2
    pde = IncompressibleFluidPDE(domain, cfg, control="buoyancy",
                                 unet_levels=3)
    return ControlTraining(
        N, pde, batch_size=B,
        trainable_networks=("CFE",) + tuple(f"OP{s}" for s in spans),
        sequence_class="staggered", obs_loss_frames=(N,),
    ).prepare()


def run(warm: bool) -> float:
    from __graft_entry__ import _make_batch

    app = make_app(warm)
    one = _make_batch(H, N, B)
    batches = jax.device_put(jax.tree_util.tree_map(
        lambda x: np.stack([x] * ITERS), one))
    jax.block_until_ready(batches)
    t0 = time.time()
    for _ in range(2):
        app.progress_multi(batches)
    jax.block_until_ready(app.params)
    compile_s = time.time() - t0
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        app.progress_multi(batches)
        jax.block_until_ready(app.params)
        dt = min(dt, (time.time() - t0) / ITERS)
    return {"warm": warm, "iter_ms": round(dt * 1e3, 2),
            "steps_per_sec": round(N * B / dt, 1),
            "compile_s": round(compile_s, 1)}


if __name__ == "__main__":
    # Interleave to cancel tunnel drift.
    cold1 = run(False)
    warm1 = run(True)
    cold2 = run(False)
    warm2 = run(True)
    for r in (cold1, warm1, cold2, warm2):
        print(json.dumps(r))
