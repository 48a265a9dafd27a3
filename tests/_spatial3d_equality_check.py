"""Standalone 3D spatial-decomposition equality check, run in a clean
subprocess by tests/test_spatial3d.py (device counts are fixed at
interpreter start — see conftest docstring).

Validates parallel/spatial3d.py::spatial_fluid3d_step: a 3D fluid rollout
with every field sharded along z over a ('data', 'space') mesh must match
the single-device physics/fluid3d.py program — forward AND gradients
(ppermute plane halos through trilinear shift advection and the CG matvec,
psum'd inner products and nullspace projection, the distributed 3D DCT,
custom_linear_solve implicit diff, all inside shard_map). Also asserts
outputs STAY sharded along 'space'.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from pde_control_tpu.grids3d import Domain3D, Staggered3D
from pde_control_tpu.parallel.spatial import make_mesh2d
from pde_control_tpu.parallel.spatial3d import spatial_fluid3d_step
from pde_control_tpu.physics.fluid3d import (
    Fluid3DConfig,
    FluidState3D,
    fluid3d_step,
)


def _blob3(rng, b, d, h, w):
    zz, yy, xx = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                             indexing="ij")
    c = rng.uniform(d * 0.25, d * 0.75, (b, 3))
    return np.exp(-((zz[None] - c[:, 0, None, None, None]) ** 2
                    + (yy[None] - c[:, 1, None, None, None]) ** 2
                    + (xx[None] - c[:, 2, None, None, None]) ** 2)
                  / (0.06 * d * h)).astype(np.float32)


def _setup(B=2, D=16, H=16, W=16, backend="jax", obstacles=True):
    rng = np.random.default_rng(0)
    obstacle = None
    if obstacles:
        obstacle = np.zeros((D, H, W), np.float32)
        obstacle[6:8, 4:12, 4:12] = 1.0  # plate → gated stencils exercised
        obstacle = jnp.asarray(obstacle)
    domain = Domain3D.create(D, H, W, obstacle_mask=obstacle)
    # Tight shared tol: the all-reduced dots round differently, so the
    # dense and distributed CG iterates drift — both must converge well
    # below the comparison rtol.
    cfg = Fluid3DConfig(dt=0.5, buoyancy=0.1, pressure_tol=1e-7,
                        pressure_maxiter=800, pressure_backend=backend)
    state0 = FluidState3D(
        velocity=Staggered3D.zeros(B, D, H, W),
        density=jnp.asarray(_blob3(rng, B, D, H, W)),
    )
    force = Staggered3D(
        vz=jnp.asarray(rng.normal(0, .05, (B, D + 1, H, W)).astype(np.float32)),
        vy=jnp.asarray(rng.normal(0, .05, (B, D, H + 1, W)).astype(np.float32)),
        vx=jnp.asarray(rng.normal(0, .05, (B, D, H, W + 1)).astype(np.float32)),
    )
    target = jnp.asarray(_blob3(np.random.default_rng(7), B, D, H, W))
    return domain, cfg, state0, force, target


def main(backend="jax", obstacles=True, tag="SPATIAL3D_EQUALITY_OK") -> None:
    assert len(jax.devices()) >= 8, jax.devices()
    N = 2
    domain, cfg, state0, force, target = _setup(backend=backend,
                                                obstacles=obstacles)
    mesh = make_mesh2d(2, 4)

    def make_loss(step):
        def loss_fn(force, state, domain, target):
            def body(s, _):
                return step(s, domain, cfg, force=force), None

            final, _ = lax.scan(body, state, None, length=N)
            return jnp.mean((final.density - target) ** 2), final

        return jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    (l1, fin1), g1 = make_loss(fluid3d_step)(force, state0, domain, target)
    fin1 = np.asarray(fin1.density)

    sharded = make_loss(
        lambda s, d, c, force: spatial_fluid3d_step(s, d, c, mesh,
                                                    force=force))
    (l2, fin2), g2 = sharded(force, state0, domain, target)

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
    """3D indirect-control channel: per-batch (B,1,1,1) buoyancy factor,
    full-field (B,D,H,W) factor, inflow, and warm-started pressure —
    gradients wrt the control channel must match the dense step's."""
    assert len(jax.devices()) >= 8, jax.devices()
    N = 2
    domain, cfg, state0, _, target = _setup(obstacles=True)
    B, D, H, W = state0.density.shape
    rng = np.random.default_rng(3)
    inflow = jnp.asarray(0.05 * _blob3(rng, B, D, H, W))
    state0 = FluidState3D(velocity=state0.velocity, density=state0.density,
                          inflow=inflow,
                          pressure=jnp.zeros((B, D, H, W), jnp.float32))
    mesh = make_mesh2d(2, 4)

    for bf, sub in ((jnp.full((B, 1, 1, 1), 0.15, jnp.float32), "perbatch"),
                    (jnp.asarray(0.1 + 0.05 * _blob3(
                        np.random.default_rng(5), B, D, H, W)), "full")):

        def make_loss(step):
            def loss_fn(bf, state):
                def body(s, _):
                    return step(s, buoyancy_factor=bf), None

                final, _ = lax.scan(body, state, None, length=N)
                return jnp.mean((final.density - target) ** 2)

            return jax.jit(jax.value_and_grad(loss_fn))

        l1, g1 = make_loss(
            lambda s, buoyancy_factor: fluid3d_step(
                s, domain, cfg, buoyancy_factor=buoyancy_factor))(bf, state0)
        l2, g2 = make_loss(
            lambda s, buoyancy_factor: spatial_fluid3d_step(
                s, domain, cfg, mesh,
                buoyancy_factor=buoyancy_factor))(bf, state0)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=2e-5, err_msg=sub)
    print("SPATIAL3D_INDIRECT_OK")


def main_iters() -> None:
    """Distributed 3D spectral preconditioner must cut CG trips on the
    obstacle domain (the 2D scaling story, third dimension)."""
    from pde_control_tpu.parallel.spatial3d import (
        spatial_pressure_solve3d_diag,
    )

    assert len(jax.devices()) >= 8, jax.devices()
    D = H = W = 32
    obstacle = np.zeros((D, H, W), np.float32)
    obstacle[D // 2: D // 2 + 2, H // 4: 3 * H // 4, W // 4: 3 * W // 4] = 1.0
    domain = Domain3D.create(D, H, W, obstacle_mask=jnp.asarray(obstacle))
    rng = np.random.default_rng(0)
    div = jnp.asarray(rng.normal(0, 1, (1, D, H, W)).astype(np.float32))
    div = div * domain.fluid_mask[None]
    mesh = make_mesh2d(1, 8)
    fn = jax.jit(spatial_pressure_solve3d_diag,
                 static_argnames=("mesh", "mode", "tol", "maxiter"))
    tol = 1e-5
    _, it_jax = fn(div, domain, mesh=mesh, mode="jax", tol=tol, maxiter=2000)
    p, it_pcg = fn(div, domain, mesh=mesh, mode="pcg", tol=tol, maxiter=2000)
    print("iters jax", int(it_jax), "pcg", int(it_pcg))
    assert int(it_pcg) * 3 <= int(it_jax), (int(it_jax), int(it_pcg))
    # The preconditioned iterate must actually SOLVE the system, not just
    # stop early: re-apply the dense gated operator (masked_laplace_spd is
    # dimension-agnostic; Domain3D duck-types it) and check the residual
    # against the deflated rhs to the CG tolerance.
    from pde_control_tpu.physics.poisson import masked_laplace_spd

    p = np.asarray(p)
    fluid = np.asarray(domain.fluid_mask)
    rhs = np.asarray(div[0]) * -1.0 * fluid
    rhs = np.where(fluid > 0, rhs - rhs[fluid > 0].mean(), 0.0)[None]
    ap = np.asarray(masked_laplace_spd(jnp.asarray(p), domain))
    ap = np.where(fluid[None] > 0,
                  ap - ap[0][fluid > 0].mean(), ap)  # deflated comparison
    res = np.linalg.norm((ap - rhs)[0][fluid > 0])
    bnorm = max(np.linalg.norm(rhs[0][fluid > 0]), 1e-30)
    print("relative residual", res / bnorm)
    assert res / bnorm <= 10 * tol, (res, bnorm)
    print("SPATIAL3D_ITERS_OK")


if __name__ == "__main__":
    import sys

    arg = sys.argv[1] if len(sys.argv) > 1 else ""
    if arg == "--indirect":
        main_indirect()
    elif arg == "--iters":
        main_iters()
    elif arg == "--spectral":
        main(backend="spectral", obstacles=False, tag="SPATIAL3D_SPECTRAL_OK")
    elif arg == "--pcg":
        main(backend="pcg", obstacles=True, tag="SPATIAL3D_PCG_OK")
    else:
        main()
