"""3D fluid physics: projection, advection oracles, differentiability.

Mirrors the 2D physics test strategy (SURVEY.md §4) on small volumes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pde_control_tpu.grids3d import Domain3D, Staggered3D
from pde_control_tpu.physics.fluid3d import (
    Fluid3DConfig,
    FluidState3D,
    advect_centered_3d,
    divergence_free_3d,
    fluid3d_step,
)

D = H = W = 12


def _blob(b=1, d=D, h=H, w=W, c=(3.0, 6.0, 6.0), r2=4.0):
    z, y, x = jnp.meshgrid(jnp.arange(d), jnp.arange(h), jnp.arange(w),
                           indexing="ij")
    rho = jnp.exp(-(((z - c[0]) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2)
                    / r2))
    return jnp.broadcast_to(rho[None], (b, d, h, w)).astype(jnp.float32)


def _obstacle_domain():
    obs = np.zeros((D, H, W), np.float32)
    obs[D // 2, 2:-2, 2:-2] = 1.0  # a horizontal plate
    return Domain3D.create(D, H, W, obstacle_mask=jnp.asarray(obs))


@pytest.mark.parametrize("with_obstacle", [False, True])
def test_projection_divergence_free(with_obstacle):
    domain = _obstacle_domain() if with_obstacle else Domain3D.create(D, H, W)
    cfg = Fluid3DConfig(pressure_tol=1e-6, pressure_maxiter=600)
    rng = np.random.default_rng(0)
    v = Staggered3D(
        vz=jnp.asarray(rng.normal(size=(2, D + 1, H, W)), jnp.float32),
        vy=jnp.asarray(rng.normal(size=(2, D, H + 1, W)), jnp.float32),
        vx=jnp.asarray(rng.normal(size=(2, D, H, W + 1)), jnp.float32),
    )
    v2, p = jax.jit(lambda v: divergence_free_3d(v, domain, cfg))(v)
    div = np.asarray(v2.divergence(domain.dx)) * np.asarray(domain.fluid_mask)
    assert np.abs(div).max() < 1e-4
    # zero normal flux on blocked faces
    assert np.abs(np.asarray(v2.vz) * (1 - np.asarray(domain.acc_z))).max() == 0
    assert np.abs(np.asarray(v2.vy) * (1 - np.asarray(domain.acc_y))).max() == 0
    assert np.abs(np.asarray(v2.vx) * (1 - np.asarray(domain.acc_x))).max() == 0


def test_plume_rises_and_stays_finite():
    domain = Domain3D.create(D, H, W)
    cfg = Fluid3DConfig(dt=1.0, buoyancy=0.15, pressure_tol=1e-5,
                        pressure_maxiter=400)
    state = FluidState3D(velocity=Staggered3D.zeros(1, D, H, W),
                         density=_blob())

    def body(s, _):
        s = fluid3d_step(s, domain, cfg)
        return s, None

    final, _ = jax.lax.scan(body, state, None, length=10)
    z = jnp.arange(D, dtype=jnp.float32)[None, :, None, None]
    com0 = float((state.density * z).sum() / state.density.sum())
    com1 = float((final.density * z).sum() / final.density.sum())
    assert np.isfinite(np.asarray(final.density)).all()
    assert com1 > com0 + 0.5, (com0, com1)


def test_no_force_no_buoyancy_fixed_point():
    domain = Domain3D.create(D, H, W)
    cfg = Fluid3DConfig(buoyancy=0.0)
    state = FluidState3D(velocity=Staggered3D.zeros(1, D, H, W),
                         density=_blob())
    nxt = fluid3d_step(state, domain, cfg)
    np.testing.assert_allclose(np.asarray(nxt.velocity.vz), 0.0)
    np.testing.assert_allclose(np.asarray(nxt.density),
                               np.asarray(state.density), atol=1e-6)


def test_shift_advection_matches_gather():
    rng = np.random.default_rng(1)
    c = jnp.asarray(rng.random((2, D, H, W)), jnp.float32)
    # |displacement| must stay under max_shift=1 or the shift path's CFL
    # clip (by design) diverges from the unclipped gather oracle
    v = Staggered3D(
        vz=jnp.asarray(rng.uniform(-0.8, 0.8, (2, D + 1, H, W)), jnp.float32),
        vy=jnp.asarray(rng.uniform(-0.8, 0.8, (2, D, H + 1, W)), jnp.float32),
        vx=jnp.asarray(rng.uniform(-0.8, 0.8, (2, D, H, W + 1)), jnp.float32),
    )
    a_shift = advect_centered_3d(c, v, dt=1.0, mode="shift", max_shift=1)
    a_gather = advect_centered_3d(c, v, dt=1.0, mode="gather")
    # identical where the backtrace stays in-bounds; edges differ by the
    # clamp order — compare the interior
    np.testing.assert_allclose(np.asarray(a_shift)[:, 2:-2, 2:-2, 2:-2],
                               np.asarray(a_gather)[:, 2:-2, 2:-2, 2:-2],
                               atol=2e-5)


def test_gradient_through_3d_rollout():
    """FD check of d(loss)/d(force) through 2 steps incl. the implicit-diff
    pressure solve."""
    domain = Domain3D.create(8, 8, 8)
    cfg = Fluid3DConfig(dt=0.5, buoyancy=0.05, pressure_tol=1e-7,
                        pressure_maxiter=400)
    state = FluidState3D(velocity=Staggered3D.zeros(1, 8, 8, 8),
                         density=_blob(1, 8, 8, 8, c=(2.0, 4.0, 4.0)))
    target = _blob(1, 8, 8, 8, c=(4.0, 4.0, 4.0))

    def loss(theta):
        force = Staggered3D(
            vz=jnp.full((1, 9, 8, 8), theta, jnp.float32),
            vy=jnp.zeros((1, 8, 9, 8), jnp.float32),
            vx=jnp.zeros((1, 8, 8, 9), jnp.float32),
        )
        s = state
        for _ in range(2):
            s = fluid3d_step(s, domain, cfg, force=force)
        return jnp.mean((s.density - target) ** 2)

    g = jax.grad(loss)(0.02)
    eps = 1e-3
    fd = (loss(0.02 + eps) - loss(0.02 - eps)) / (2 * eps)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=2e-2, atol=1e-7)


def test_warm_start_3d_matches_cold():
    # backend='pcg' pins the ITERATIVE path: on an obstacle-free closed
    # volume 'auto' resolves to the exact spectral solve, which ignores x0
    # and would make this test vacuous.
    domain = Domain3D.create(D, H, W)
    warm = Fluid3DConfig(buoyancy=0.1, pressure_tol=1e-6,
                         pressure_maxiter=600, warm_start_pressure=True,
                         pressure_backend="pcg")
    cold = Fluid3DConfig(buoyancy=0.1, pressure_tol=1e-6,
                         pressure_maxiter=600, pressure_backend="pcg")
    s_warm = FluidState3D(velocity=Staggered3D.zeros(1, D, H, W),
                          density=_blob(),
                          pressure=jnp.zeros((1, D, H, W), jnp.float32))
    s_cold = FluidState3D(velocity=Staggered3D.zeros(1, D, H, W),
                          density=_blob())
    for _ in range(3):
        s_warm = fluid3d_step(s_warm, domain, warm)
        s_cold = fluid3d_step(s_cold, domain, cold)
    np.testing.assert_allclose(np.asarray(s_warm.density),
                               np.asarray(s_cold.density), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_warm.velocity.vz),
                               np.asarray(s_cold.velocity.vz), atol=1e-4)


def test_spectral_3d_matches_cg():
    """Exact 3D DCT/DST solves agree with masked CG on obstacle-free
    domains (closed/Neumann and open/Dirichlet)."""
    from pde_control_tpu.physics.poisson import solve_pressure

    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal((2, 8, 10, 12)), jnp.float32)
    for closed in (True, False):
        domain = Domain3D.create(8, 10, 12, closed=closed)
        rhs = b - b.mean(axis=(1, 2, 3), keepdims=True) if closed else b
        p_sp = solve_pressure(rhs, domain, backend="spectral")
        p_cg = solve_pressure(rhs, domain, tol=1e-8, maxiter=2000,
                              backend="jax")
        if closed:  # both zero-mean gauge
            p_sp = p_sp - p_sp.mean(axis=(1, 2, 3), keepdims=True)
            p_cg = p_cg - p_cg.mean(axis=(1, 2, 3), keepdims=True)
        np.testing.assert_allclose(np.asarray(p_sp), np.asarray(p_cg),
                                   atol=5e-4)


def test_pcg_3d_with_obstacles():
    """Spectrally-preconditioned CG converges on 3D obstacle domains and
    'auto' routes there."""
    from pde_control_tpu.physics.poisson import _pick_backend, solve_pressure

    domain = _obstacle_domain()
    rng = np.random.default_rng(8)
    v = Staggered3D(
        vz=jnp.asarray(rng.normal(size=(1, D + 1, H, W)), jnp.float32),
        vy=jnp.asarray(rng.normal(size=(1, D, H + 1, W)), jnp.float32),
        vx=jnp.asarray(rng.normal(size=(1, D, H, W + 1)), jnp.float32),
    )
    v = domain.mask_velocity(v)
    div = v.divergence(domain.dx)
    assert _pick_backend("auto", div, domain) == "pcg"
    p = solve_pressure(div, domain, tol=1e-6, maxiter=300, backend="pcg")
    v2 = v - domain.pressure_gradient(p)
    res = np.asarray(v2.divergence(domain.dx)) * np.asarray(domain.fluid_mask)
    assert np.abs(res).max() < 1e-4


def test_full_field_buoyancy_factor_3d():
    """Full (B, D, H, W) buoyancy_factor — the indirect-control channel the
    docstring promises — must apply (weight density at centers, then
    resample to z-faces). Regression: this crashed with a broadcast error
    against the (B, D+1, H, W) z-face field."""
    from pde_control_tpu.grids3d import Domain3D

    domain = Domain3D.create(D, H, W)
    cfg = Fluid3DConfig(dt=0.5, buoyancy=0.0, pressure_tol=1e-5,
                        pressure_maxiter=200)
    rng = np.random.default_rng(0)
    state = FluidState3D(
        velocity=Staggered3D.zeros(2, D, H, W),
        density=jnp.asarray(rng.random((2, D, H, W)), jnp.float32))
    buoy = jnp.ones((2, D, H, W), jnp.float32) * 0.1
    out_full = fluid3d_step(state, domain, cfg, buoyancy_factor=buoy)
    # a constant full field must equal the scalar-factor path
    out_scalar = fluid3d_step(state, domain, cfg,
                              buoyancy_factor=jnp.full((2, 1, 1, 1), 0.1))
    np.testing.assert_allclose(np.asarray(out_full.velocity.vz),
                               np.asarray(out_scalar.velocity.vz),
                               atol=1e-6)
    assert np.isfinite(np.asarray(out_full.density)).all()
