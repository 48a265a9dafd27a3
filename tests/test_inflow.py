"""Inflow-driven smoke task tests (VERDICT r1 items 2-3).

The reference smoke benchmark uses a continuous Inflow FieldEffect with
obstacles and buoyancy-only (indirect) control [R]. These tests pin down:
(a) inflow physics — density is injected every step and rides the scan;
(b) the dataset is non-degenerate — the target frame is NOT the natural
    (zero-force) evolution of the same initial state + inflow;
(c) the ControlTraining plumbing works end-to-end with with_inflow=True.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE
from pde_control_tpu.control.training import ControlTraining
from pde_control_tpu.data.generate import (
    generate_inflow_smoke_dataset,
    random_inflow,
)
from pde_control_tpu.grids import Domain2D, Staggered2D
from pde_control_tpu.physics.fluid import FluidConfig, FluidState, fluid_step

H = 16
CFG = FluidConfig(dt=1.0, buoyancy=0.08, pressure_tol=1e-4,
                  pressure_maxiter=60)


@pytest.fixture(scope="module")
def domain():
    obs = np.zeros((H, H), np.float32)
    obs[H // 2, 3 : H // 2] = 1.0
    return Domain2D.create(H, H, obstacle_mask=jnp.asarray(obs))


def test_inflow_injects_density_every_step(domain):
    inflow = np.zeros((1, H, H), np.float32)
    inflow[0, 3, 8] = 0.1
    state = FluidState.zeros(1, H, H).replace(inflow=jnp.asarray(inflow))
    s1 = fluid_step(state, domain, CFG)
    s2 = fluid_step(s1, domain, CFG)
    # mass grows by ~dt * sum(inflow) each step (advection conserves)
    m0, m1, m2 = (float(s.density.sum()) for s in (state, s1, s2))
    assert m1 == pytest.approx(0.1, rel=1e-5)
    assert m2 - m1 == pytest.approx(0.1, rel=0.05)
    # inflow itself is carried unchanged through the step
    np.testing.assert_array_equal(np.asarray(s2.inflow), inflow)


def test_inflow_dataset_is_not_natural_evolution(domain):
    n = 8
    data = generate_inflow_smoke_dataset(domain, CFG, num=4, n_steps=n,
                                         seed=0, control_amplitude=1.0)
    batch = data.sample(np.random.default_rng(0), 4)
    assert batch["inflow"].shape == (4, H, H)
    gt_final = batch["obs"][:, n, :, :, 0]
    assert gt_final.sum() > 0  # the plume exists

    # natural (zero-force) evolution from the same initial state + inflow
    state = FluidState(
        velocity=Staggered2D(vy=jnp.asarray(batch["vy0"]),
                             vx=jnp.asarray(batch["vx0"])),
        density=jnp.asarray(batch["obs"][:, 0, :, :, 0]),
        inflow=jnp.asarray(batch["inflow"]),
    )

    def body(s, _):
        return fluid_step(s, domain, CFG), None

    natural, _ = lax.scan(body, state, None, length=n)
    zero_force_mse = float(np.mean(
        (np.asarray(natural.density) - gt_final) ** 2))
    scale = float(np.mean(gt_final**2))
    # withheld forcing must move the target well away from natural drift
    assert zero_force_mse > 0.01 * scale, (zero_force_mse, scale)


def test_control_training_with_inflow(domain):
    n = 2
    data = generate_inflow_smoke_dataset(domain, CFG, num=8, n_steps=n,
                                         seed=1)
    pde = IncompressibleFluidPDE(domain, CFG, control="buoyancy",
                                 with_inflow=True, unet_levels=2)
    app = ControlTraining(
        n, pde, dataset=data, batch_size=4,
        trainable_networks=("CFE",), sequence_class="chain",
        obs_loss_frames=(1, 2),
    ).prepare()
    m = app.progress()
    assert np.isfinite(float(m["loss"]))
    batch = data.sample(np.random.default_rng(0), 4)
    obs_traj, costs, final, forces = app.infer_all_frames(batch,
                                                          keep_forces=True)
    assert obs_traj.shape == (n, 4, H, H, 1)
    # indirect control: x-forces are identically zero, y-forces masked by ρ
    assert float(jnp.abs(forces.vx).max()) == 0.0
    assert forces.vy.shape == (n, 4, H + 1, H)
    # the state must keep carrying the inflow (density keeps growing)
    assert float(final.density.sum()) > float(batch["obs"][:, 0].sum())


def test_with_inflow_requires_batch_key(domain):
    pde = IncompressibleFluidPDE(domain, CFG, control="buoyancy",
                                 with_inflow=True, unet_levels=2)
    with pytest.raises(ValueError, match="inflow"):
        pde.initial_state({"obs": np.zeros((2, 3, H, H, 1), np.float32)})


def test_random_inflow_location_and_rate():
    infl = np.asarray(random_inflow(jax.random.PRNGKey(0), 4, 32, 32,
                                    rate=0.1))
    assert infl.shape == (4, 32, 32)
    assert infl.max() <= 0.1 + 1e-6
    # emitter sits near the bottom
    ys = infl.reshape(4, 32, 32).max(axis=2).argmax(axis=1)
    assert (ys <= 8).all(), ys
