"""Standalone spatial-domain-decomposition equality check, run in a clean
subprocess by tests/test_spatial.py (the in-process suite cannot
reconfigure device counts — see conftest docstring).

Validates parallel/spatial.py::spatial_fluid_step: a fluid rollout with
every field sharded along H over a ('data', 'space') mesh must match the
single-device physics/fluid.py program — forward AND gradients (ppermute
halo exchange through shift advection and the CG matvec, psum'd inner
products and nullspace projection, custom_linear_solve implicit diff,
all inside shard_map). Also asserts outputs STAY sharded along 'space'
(no silent gather-to-replicated). Prints SPATIAL_EQUALITY_OK /
SPATIAL_INDIRECT_OK on success.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from pde_control_tpu.grids import Domain2D, Staggered2D
from pde_control_tpu.parallel.spatial import make_mesh2d, spatial_fluid_step
from pde_control_tpu.physics.fluid import FluidConfig, FluidState, fluid_step


def _blob(rng, b, h, w):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    c = rng.uniform(h * 0.2, h * 0.8, (b, 2))
    return np.exp(-((yy[None] - c[:, 0, None, None]) ** 2
                    + (xx[None] - c[:, 1, None, None]) ** 2)
                  / (0.03 * h * w)).astype(np.float32)


def _setup(B=4, H=32, W=32, backend="jax", obstacles=True):
    rng = np.random.default_rng(0)
    obstacle = None
    if obstacles:
        obstacle = np.zeros((H, W), np.float32)
        obstacle[12:14, 8:24] = 1.0  # plate → gated stencils exercised
        obstacle = jnp.asarray(obstacle)
    domain = Domain2D.create(H, W, obstacle_mask=obstacle)
    # Same backend on BOTH paths at tight tol, so the dense and
    # distributed solves converge well below the comparison rtol —
    # the all-reduced dots round differently, so iterates drift apart.
    cfg = FluidConfig(dt=0.5, buoyancy=0.1, pressure_tol=1e-7,
                      pressure_maxiter=800, pressure_backend=backend)
    state0 = FluidState(
        velocity=Staggered2D.zeros(B, H, W),
        density=jnp.asarray(_blob(rng, B, H, W)),
    )
    force = Staggered2D(
        vy=jnp.asarray(rng.normal(0, 0.05, (B, H + 1, W)).astype(np.float32)),
        vx=jnp.asarray(rng.normal(0, 0.05, (B, H, W + 1)).astype(np.float32)),
    )
    target = jnp.asarray(_blob(np.random.default_rng(7), B, H, W))
    return domain, cfg, state0, force, target


def main(backend="jax", obstacles=True, tag="SPATIAL_EQUALITY_OK",
         dense_backend=None) -> None:
    assert len(jax.devices()) >= 8, jax.devices()
    N = 3
    domain, cfg, state0, force, target = _setup(backend=backend,
                                                obstacles=obstacles)
    # The dense path may need a different backend name (poisson has no
    # 'pcg2'); both converge to the tight shared tol, so the solutions
    # agree even when the preconditioners differ.
    import dataclasses

    dense_cfg = (dataclasses.replace(cfg, pressure_backend=dense_backend)
                 if dense_backend else cfg)
    mesh = make_mesh2d(2, 4)

    def make_loss(step, use_cfg=cfg):
        def loss_fn(force, state, domain, target):
            def body(s, _):
                return step(s, domain, use_cfg, force=force), None

            final, _ = lax.scan(body, state, None, length=N)
            return jnp.mean((final.density - target) ** 2), final

        return jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    (l1, fin1), g1 = make_loss(fluid_step, dense_cfg)(
        force, state0, domain, target)
    fin1 = np.asarray(fin1.density)

    sharded = make_loss(
        lambda s, d, c, force: spatial_fluid_step(s, d, c, mesh, force=force))
    (l2, fin2), g2 = sharded(force, state0, domain, target)

    # Outputs must still be sharded over 'space' — the memory-scaling
    # point would be hollow if GSPMD resharded to replicated.
    assert "space" in str(fin2.density.sharding.spec), (
        fin2.density.sharding.spec)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(fin1, np.asarray(fin2.density),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(g1)),
                    jax.tree_util.tree_leaves(jax.device_get(g2))):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-5)
    print(tag)


def main_indirect() -> None:
    """Indirect-control channel (per-batch buoyancy factor) + inflow +
    warm-started pressure: gradient wrt the buoyancy factor must match."""
    assert len(jax.devices()) >= 8, jax.devices()
    N = 2
    domain, cfg, state0, _, target = _setup()
    B, H, W = state0.density.shape
    rng = np.random.default_rng(3)
    inflow = jnp.asarray(0.05 * _blob(rng, B, H, W))
    state0 = FluidState(velocity=state0.velocity, density=state0.density,
                        inflow=inflow,
                        pressure=jnp.zeros((B, H, W), jnp.float32))
    mesh = make_mesh2d(2, 4)
    bf = jnp.full((B, 1, 1), 0.15, jnp.float32)

    def make_loss(step):
        def loss_fn(bf, state):
            def body(s, _):
                return step(s, buoyancy_factor=bf), None

            final, _ = lax.scan(body, state, None, length=N)
            return jnp.mean((final.density - target) ** 2)

        return jax.jit(jax.value_and_grad(loss_fn))

    l1, g1 = make_loss(
        lambda s, buoyancy_factor: fluid_step(
            s, domain, cfg, buoyancy_factor=buoyancy_factor))(bf, state0)
    l2, g2 = make_loss(
        lambda s, buoyancy_factor: spatial_fluid_step(
            s, domain, cfg, mesh, buoyancy_factor=buoyancy_factor))(
                bf, state0)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=2e-5)
    print("SPATIAL_INDIRECT_OK")


def main_opt() -> None:
    """parallel/spatial_opt.py: the distributed adjoint optimization must
    decrease its loss and keep forces sharded (16², n=2, 6 adam steps)."""
    assert len(jax.devices()) >= 8, jax.devices()
    from pde_control_tpu.parallel.spatial_opt import optimize_forces_spatial

    H = 16
    rng = np.random.default_rng(0)
    domain = Domain2D.create(H, H)
    cfg = FluidConfig(dt=0.5, buoyancy=0.0, pressure_tol=1e-5,
                      pressure_maxiter=200, pressure_backend="spectral")
    state0 = FluidState(
        velocity=Staggered2D.zeros(2, H, H),
        density=jnp.asarray(_blob(rng, 2, H, H)))
    target = jnp.asarray(_blob(np.random.default_rng(5), 2, H, H))
    mesh = make_mesh2d(2, 4)
    forces, hist = optimize_forces_spatial(
        state0, target, domain, cfg, mesh, n=2, iterations=6,
        learning_rate=2.0, force_reg=1e-5)
    obs = np.asarray(hist["obs_loss"])
    assert np.all(np.isfinite(obs)), obs
    assert obs[-1] < obs[0] * 0.9, obs
    assert "space" in str(forces.vy.sharding.spec), forces.vy.sharding
    assert "space" in str(forces.vx.sharding.spec), forces.vx.sharding
    print("SPATIAL_OPT_OK")


def main_iters2() -> None:
    """The coarse-space correction must CUT distributed-CG iteration
    counts on the scaling study's obstacle layout (a plate scaled with the
    domain — the long-range perturbation the one-level spectral
    preconditioner provably misses; RESULTS.md 'honest scaling note')."""
    assert len(jax.devices()) >= 8, jax.devices()
    from pde_control_tpu.parallel.spatial import spatial_pressure_solve_diag

    H = 128
    obstacle = np.zeros((H, H), np.float32)
    obstacle[H // 2, H // 4: H // 2] = 1.0  # the bench/scaling plate
    domain = Domain2D.create(H, H, obstacle_mask=jnp.asarray(obstacle))
    rng = np.random.default_rng(0)
    div = jnp.asarray(rng.normal(0, 1, (1, H, H)).astype(np.float32))
    mesh = make_mesh2d(1, 8)
    counts = {}
    sols = {}
    for mode in ("pcg", "pcg2"):
        p, k = jax.jit(
            lambda d, m=mode: spatial_pressure_solve_diag(
                d, domain, mesh, mode=m, tol=1e-6, maxiter=2000))(div)
        counts[mode] = int(k)
        sols[mode] = np.asarray(p)
    print("iterations:", counts)
    # Same solution (both converged far past the comparison tolerance;
    # pressure is mean-deflated on both paths, so directly comparable).
    np.testing.assert_allclose(sols["pcg"], sols["pcg2"],
                               rtol=1e-3, atol=1e-4)
    assert counts["pcg2"] < counts["pcg"], counts
    print("SPATIAL_ITERS2_OK")


if __name__ == "__main__":
    import sys as _sys

    if "--indirect" in _sys.argv:
        main_indirect()
    elif "--opt" in _sys.argv:
        main_opt()
    elif "--pcg2" in _sys.argv:
        # Two-level (spectral + coarse-space) distributed PCG vs the dense
        # one-level deflated-spectral PCG: different preconditioners, same
        # tight tol → same solution, forward and gradients.
        main(backend="pcg2", dense_backend="pcg", tag="SPATIAL_PCG2_OK")
    elif "--iters2" in _sys.argv:
        main_iters2()
    elif "--pcg" in _sys.argv:
        # Distributed spectral-PCG vs the dense deflated-spectral PCG
        # (obstacle domain — the preconditioner is approximate there, CG
        # iterates to the same tight tol on both paths).
        main(backend="pcg", tag="SPATIAL_PCG_OK")
    elif "--spectral" in _sys.argv:
        # Distributed EXACT spectral solve vs the dense exact DCT solve
        # (obstacle-free domain; no CG at all on either path).
        main(backend="spectral", obstacles=False, tag="SPATIAL_SPECTRAL_OK")
    else:
        main()
