"""Pallas kernel tests (interpret mode on CPU; the jax path is the oracle).

SURVEY.md §7 step 6: the Pallas fused CG is the perf path; the pure-JAX CG
remains the correctness reference — these tests pin them together.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pde_control_tpu.grids import Domain2D, Staggered2D
from pde_control_tpu.physics.fluid import FluidConfig, divergence_free
from pde_control_tpu.physics.poisson import masked_laplace_spd, solve_pressure


def _domain(obstacle: bool, closed: bool) -> Domain2D:
    h = w = 16
    mask = None
    if obstacle:
        m = np.zeros((h, w), np.float32)
        m[5:9, 6:11] = 1.0
        mask = jnp.asarray(m)
    return Domain2D.create(h, w, obstacle_mask=mask, closed=closed)


@pytest.mark.parametrize("obstacle,closed", [(False, True), (True, True),
                                             (False, False)])
def test_pallas_solve_matches_jax(rng, obstacle, closed):
    domain = _domain(obstacle, closed)
    div = jnp.asarray(rng.normal(size=(2, 16, 16)), jnp.float32)
    p_jax = solve_pressure(div, domain, tol=1e-7, maxiter=800, backend="jax")
    p_pal = solve_pressure(div, domain, tol=1e-7, maxiter=800,
                           backend="pallas")
    # Both solve the same system: compare residuals & solutions.
    r_jax = np.asarray(masked_laplace_spd(p_jax, domain))
    r_pal = np.asarray(masked_laplace_spd(p_pal, domain))
    np.testing.assert_allclose(r_pal, r_jax, atol=5e-4)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_jax), atol=5e-3)


def test_pallas_projection_grad_matches_jax(rng):
    domain = _domain(True, True)
    h, w = domain.grid_shape
    v = Staggered2D(
        vy=jnp.asarray(rng.normal(size=(1, h + 1, w)), jnp.float32),
        vx=jnp.asarray(rng.normal(size=(1, h, w + 1)), jnp.float32),
    )
    wgt = jnp.asarray(rng.normal(size=(1, h, w)), jnp.float32)

    def loss(vy, backend):
        cfg = FluidConfig(pressure_tol=1e-7, pressure_maxiter=800,
                          pressure_backend=backend)
        v2, _ = divergence_free(Staggered2D(vy=vy, vx=v.vx), domain, cfg)
        return jnp.sum(v2.vy[:, 1:, :] * wgt)

    g_jax = jax.jit(jax.grad(lambda x: loss(x, "jax")))(v.vy)
    g_pal = jax.jit(jax.grad(lambda x: loss(x, "pallas")))(v.vy)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_jax),
                               rtol=1e-3, atol=1e-4)
