"""Standalone multi-device equality check, run in a clean subprocess by
tests/test_mesh.py (the in-process suite cannot reconfigure device counts —
see conftest docstring). Prints MESH_EQUALITY_OK on success."""

import numpy as np

import jax

from pde_control_tpu.control.pde_burgers import BurgersPDE
from pde_control_tpu.control.training import ControlTraining
from pde_control_tpu.data.generate import generate_burgers_dataset
from pde_control_tpu.parallel.mesh import make_mesh
from pde_control_tpu.physics.burgers import BurgersConfig


def main() -> None:
    assert len(jax.devices()) >= 8, jax.devices()
    cfg = BurgersConfig(n=16, dt=0.5, viscosity=0.05)
    pde = BurgersPDE(cfg)
    data = generate_burgers_dataset(cfg, num=32, n_steps=2, seed=0)
    batch = data.sample(np.random.default_rng(1), 8)

    def make_app(mesh):
        return ControlTraining(
            2, pde, dataset=data, batch_size=8,
            trainable_networks=("CFE",), sequence_class="chain",
            obs_loss_frames=(1, 2), seed=3, mesh=mesh,
        ).prepare()

    app_single = make_app(None)
    m1 = app_single.progress(batch)
    app_mesh = make_app(make_mesh(8))
    assert app_mesh.mesh.devices.size == 8
    m2 = app_mesh.progress(batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(app_single.params),
                    jax.tree_util.tree_leaves(app_mesh.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)
    print("MESH_EQUALITY_OK")


def main_3d() -> None:
    """Same DP-equality pin on the 3D family (volume batches sharded over
    the data mesh; dim=3 nets)."""
    import jax.numpy as jnp
    from jax import lax

    from pde_control_tpu.control.pde_fluid3d import IncompressibleFluid3DPDE
    from pde_control_tpu.data.scene import TrajectoryDataset
    from pde_control_tpu.grids3d import Domain3D, Staggered3D
    from pde_control_tpu.physics.fluid3d import (
        Fluid3DConfig,
        FluidState3D,
        fluid3d_step,
    )

    S, N, B = 8, 2, 8
    domain = Domain3D.create(S, S, S)
    cfg = Fluid3DConfig(dt=0.5, buoyancy=0.05, pressure_tol=1e-5,
                        pressure_maxiter=200)
    rng = np.random.default_rng(0)
    z, y, x = np.meshgrid(*([np.arange(S)] * 3), indexing="ij")
    c = rng.uniform(2, 6, (16, 3))
    d0 = np.exp(-((z[None] - c[:, 0, None, None, None]) ** 2
                  + (y[None] - c[:, 1, None, None, None]) ** 2
                  + (x[None] - c[:, 2, None, None, None]) ** 2) / 3.0
                ).astype(np.float32)

    @jax.jit
    def rollout(d0):
        state = FluidState3D(velocity=Staggered3D.zeros(16, S, S, S),
                             density=jnp.asarray(d0))

        def body(s, _):
            s2 = fluid3d_step(s, domain, cfg)
            return s2, s2.density

        _, dens = lax.scan(body, state, None, length=N)
        return jnp.concatenate([jnp.asarray(d0)[None], dens], axis=0)

    obs = np.moveaxis(np.asarray(rollout(d0)), 0, 1)[..., None]
    data = TrajectoryDataset(obs)
    pde = IncompressibleFluid3DPDE(domain, cfg, unet_levels=2)
    batch = data.sample(np.random.default_rng(1), B)

    def make_app(mesh):
        return ControlTraining(
            N, pde, dataset=data, batch_size=B,
            trainable_networks=("CFE", "OP2"), sequence_class="staggered",
            obs_loss_frames=(N,), seed=3, mesh=mesh,
        ).prepare()

    app_single = make_app(None)
    m1 = app_single.progress(batch)
    app_mesh = make_app(make_mesh(8))
    m2 = app_mesh.progress(batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4, atol=1e-12)
    for xs, ys in zip(jax.tree_util.tree_leaves(app_single.params),
                      jax.tree_util.tree_leaves(app_mesh.params)):
        np.testing.assert_allclose(np.asarray(xs), np.asarray(ys),
                                   rtol=1e-3, atol=1e-5)
    print("MESH_EQUALITY_3D_OK")


if __name__ == "__main__":
    import sys as _sys

    if "--3d" in _sys.argv:
        main_3d()
    else:
        main()
