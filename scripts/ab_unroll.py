"""A/B the rollout scan unroll factor on the bench iteration (TPU).

Same protocol as bench.py (fused 8-step programs, device-resident batches,
best-of-3). The bench point is kernel-count bound (RESULTS.md roofline);
unrolling lets XLA fuse elementwise chains across rollout steps at the
cost of code size / compile time.
"""
import json
import sys
import time

import numpy as np

import jax

sys.path.insert(0, "/root/repo")
import __graft_entry__  # noqa: E402,F401  (compile cache)
from __graft_entry__ import _make_batch  # noqa: E402

H, N, B, ITERS = 64, 16, 8, 8


def make_app(unroll: int):
    import jax.numpy as jnp

    from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE
    from pde_control_tpu.control.training import ControlTraining
    from pde_control_tpu.grids import Domain2D
    from pde_control_tpu.physics.fluid import FluidConfig

    obstacle = np.zeros((H, H), np.float32)
    obstacle[H // 2, H // 4: H // 2] = 1.0
    domain = Domain2D.create(H, H, obstacle_mask=jnp.asarray(obstacle))
    cfg = FluidConfig(dt=1.0, buoyancy=0.08, pressure_tol=1e-4,
                      pressure_maxiter=100, warm_start_pressure=True)
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
        scan_unroll=unroll,
    ).prepare()


def run(unroll: int) -> dict:
    app = make_app(unroll)
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
    return {"unroll": unroll, "iter_ms": round(dt * 1e3, 2),
            "steps_per_sec": round(N * B / dt, 1),
            "compile_s": round(compile_s, 1)}


if __name__ == "__main__":
    for u in (1, 2, 4, 1):  # repeat 1 to cancel tunnel drift
        print(json.dumps(run(u)), flush=True)
