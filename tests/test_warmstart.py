"""Warm-started pressure solves (FluidConfig.warm_start_pressure).

The previous rollout step's pressure seeds the next projection's CG. The
solution must be unchanged (to solver tolerance) and the implicit-diff
gradient must match the cold-start path — the transpose solve always starts
cold, so backward numerics are the round-1 path exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pde_control_tpu.grids import Domain2D, Staggered2D
from pde_control_tpu.physics.fluid import FluidConfig, FluidState, fluid_step
from pde_control_tpu.physics.poisson import masked_laplace_spd, solve_pressure


def _domain(h=16, w=16, obstacle=True):
    mask = None
    if obstacle:
        m = np.zeros((h, w), np.float32)
        m[5:9, 6:11] = 1.0
        mask = jnp.asarray(m)
    return Domain2D.create(h, w, obstacle_mask=mask)


@pytest.mark.parametrize("backend", ["jax", "pcg", "pallas"])
def test_warm_start_same_solution(rng, backend):
    domain = _domain()
    div = jnp.asarray(rng.normal(size=(2, 16, 16)), jnp.float32)
    cold = solve_pressure(div, domain, tol=1e-7, maxiter=800, backend=backend)
    # Warm-start from a perturbed copy of the solution AND from garbage:
    # both must land on the same solution (residual-equal; nullspace shifts
    # allowed on the closed domain are removed by the in-solve projection).
    for guess in [cold + 0.01 * jnp.asarray(rng.normal(size=cold.shape),
                                            jnp.float32),
                  jnp.asarray(rng.normal(size=cold.shape), jnp.float32)]:
        warm = solve_pressure(div, domain, tol=1e-7, maxiter=800,
                              backend=backend, x0=guess)
        r_cold = np.asarray(masked_laplace_spd(cold, domain))
        r_warm = np.asarray(masked_laplace_spd(warm, domain))
        np.testing.assert_allclose(r_warm, r_cold, atol=5e-4)
        np.testing.assert_allclose(np.asarray(warm), np.asarray(cold),
                                   atol=5e-3)


def test_warm_start_rollout_matches_cold(rng):
    h = w = 16
    domain = _domain(h, w)
    density = jnp.asarray(rng.uniform(size=(2, h, w)), jnp.float32)

    def rollout(warm: bool):
        cfg = FluidConfig(dt=0.5, buoyancy=0.1, pressure_tol=1e-7,
                          pressure_maxiter=1000, warm_start_pressure=warm)
        state = FluidState(
            velocity=Staggered2D.zeros(2, h, w),
            density=density,
            pressure=jnp.zeros((2, h, w)) if warm else None,
        )
        for _ in range(4):
            state = fluid_step(state, domain, cfg)
        return state

    cold, warm = rollout(False), rollout(True)
    np.testing.assert_allclose(np.asarray(warm.density),
                               np.asarray(cold.density), atol=1e-4)
    np.testing.assert_allclose(np.asarray(warm.velocity.vy),
                               np.asarray(cold.velocity.vy), atol=1e-3)
    assert warm.pressure is not None and warm.pressure.shape == (2, h, w)


def test_warm_start_grad_matches_cold(rng):
    # The warm-started rollout's gradient w.r.t. a control force must match
    # the cold path: x0 is stop_gradient'd and the transpose solve is cold.
    h = w = 12
    domain = _domain(h, w, obstacle=True)
    density = jnp.asarray(rng.uniform(size=(1, h, w)), jnp.float32)
    fy0 = jnp.zeros((1, h + 1, w))
    wgt = jnp.linspace(0, 1, h)[None, :, None]

    def loss(fy, warm):
        cfg = FluidConfig(dt=0.5, buoyancy=0.05, pressure_tol=1e-8,
                          pressure_maxiter=900, warm_start_pressure=warm)
        s = FluidState(
            velocity=Staggered2D.zeros(1, h, w), density=density,
            pressure=jnp.zeros((1, h, w)) if warm else None,
        )
        force = Staggered2D(vy=fy, vx=jnp.zeros((1, h, w + 1)))
        for _ in range(3):
            s = fluid_step(s, domain, cfg, force=force)
        return jnp.sum(s.density * wgt)

    g_cold = jax.jit(jax.grad(lambda f: loss(f, False)))(fy0)
    g_warm = jax.jit(jax.grad(lambda f: loss(f, True)))(fy0)
    np.testing.assert_allclose(np.asarray(g_warm), np.asarray(g_cold),
                               rtol=1e-3, atol=1e-5)
