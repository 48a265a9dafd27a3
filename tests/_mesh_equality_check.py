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


if __name__ == "__main__":
    main()
