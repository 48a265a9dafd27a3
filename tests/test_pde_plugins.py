"""Unit tests for the PDE plugins' net-glue (channel stacking, force modes)."""

import numpy as np

import jax.numpy as jnp

from pde_control_tpu.control.pde_burgers import BurgersPDE
from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE
from pde_control_tpu.grids import Domain2D
from pde_control_tpu.physics.burgers import BurgersConfig
from pde_control_tpu.physics.fluid import FluidConfig


def _fluid_pde(control, force_mask=None):
    dom = Domain2D.create(16, 16)
    return IncompressibleFluidPDE(dom, FluidConfig(pressure_maxiter=50),
                                  control=control, force_mask=force_mask,
                                  unet_levels=2, dtype=jnp.float32)


def test_cfe_input_channels():
    pde = _fluid_pde("direct")
    s = pde.example_state(2)
    obs = pde.observe(s)
    x = pde.cfe_inputs(s, obs)
    assert x.shape == (2, 16, 16, 5)  # density, vy, vx, target, mask
    assert pde.op_inputs(obs, obs).shape == (2, 16, 16, 3)


def test_direct_force_resamples_to_faces(rng):
    pde = _fluid_pde("direct")
    s = pde.example_state(1)
    net_out = jnp.asarray(rng.normal(size=(1, 16, 16, 2)), jnp.float32)
    f = pde.force_from_net(net_out, s)
    assert f.vy.shape == (1, 17, 16) and f.vx.shape == (1, 16, 17)
    assert float(pde.force_cost(f)[0]) > 0


def test_buoyancy_force_is_upward_and_density_gated(rng):
    pde = _fluid_pde("buoyancy")
    s = pde.example_state(1)
    # zero density -> indirect control can exert NO force at all
    net_out = jnp.asarray(rng.normal(size=(1, 16, 16, 1)), jnp.float32)
    f = pde.force_from_net(net_out, s)
    assert float(jnp.abs(f.vy).max()) == 0.0
    assert float(jnp.abs(f.vx).max()) == 0.0
    # with smoke present, only vy carries force
    s = s.replace(density=jnp.ones_like(s.density))
    f = pde.force_from_net(net_out, s)
    assert float(jnp.abs(f.vy).max()) > 0
    assert float(jnp.abs(f.vx).max()) == 0.0


def test_force_mask_restricts_forcing(rng):
    mask = np.zeros((16, 16), np.float32)
    mask[:, :8] = 1.0  # forcing allowed only in the left half
    pde = _fluid_pde("direct", force_mask=jnp.asarray(mask))
    s = pde.example_state(1)
    net_out = jnp.ones((1, 16, 16, 2), jnp.float32)
    f = pde.force_from_net(net_out, s)
    # x-faces fully right of the masked region carry no force
    assert float(jnp.abs(f.vx[:, :, 10:]).max()) == 0.0
    assert float(jnp.abs(f.vx[:, :, :8]).max()) > 0


def test_burgers_glue():
    pde = BurgersPDE(BurgersConfig(n=16))
    s = pde.example_state(3)
    obs = pde.observe(s)
    assert obs.shape == (3, 16, 1)
    x = pde.cfe_inputs(s, obs)
    assert x.shape == (3, 16, 2)
    f = pde.force_from_net(jnp.ones((3, 16, 1)), s)
    assert f.shape == (3, 16)
