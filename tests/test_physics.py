"""Solver correctness + differentiability tests (SURVEY.md §4 items 2-3)."""

import jax
import jax.numpy as jnp
import numpy as np

from pde_control_tpu.grids import Domain2D, Staggered2D
from pde_control_tpu.physics.burgers import BurgersConfig, burgers_step
from pde_control_tpu.physics.fluid import (
    FluidConfig,
    FluidState,
    divergence_free,
    fluid_step,
)
from pde_control_tpu.physics.poisson import cg, masked_laplace_spd, solve_pressure


# ---------------------------------------------------------------- Burgers

def test_burgers_constant_state_fixed_point():
    cfg = BurgersConfig(n=32, dt=0.1, viscosity=0.1)
    u = jnp.full((2, 32), 0.5)
    u1 = burgers_step(u, None, cfg)
    np.testing.assert_allclose(np.asarray(u1), 0.5, atol=1e-5)


def test_burgers_diffusion_decay():
    # Pure diffusion (tiny amplitude → negligible advection): sine decays at
    # exp(-ν k² t) per step with the discrete rate (1 - ν·dt·k_d²).
    n = 64
    cfg = BurgersConfig(n=n, dx=1.0, dt=0.1, viscosity=0.5)
    k = 2 * jnp.pi / n
    u = 1e-3 * jnp.sin(k * jnp.arange(n))[None]
    u1 = burgers_step(u, None, cfg)
    kd2 = 2.0 * (1.0 - jnp.cos(k))  # discrete laplacian eigenvalue
    expect = (1.0 - cfg.viscosity * cfg.dt * kd2) * u
    np.testing.assert_allclose(np.asarray(u1), np.asarray(expect), atol=1e-8)


def test_burgers_grad_check(rng):
    cfg = BurgersConfig(n=16, dt=0.3, viscosity=0.05)
    u0 = jnp.asarray(rng.normal(size=(1, 16)) * 0.5, jnp.float32)
    f0 = jnp.asarray(rng.normal(size=(1, 16)) * 0.1, jnp.float32)

    def loss(f):
        u = u0
        for _ in range(4):
            u = burgers_step(u, f, cfg)
        return jnp.sum(u**2)

    g = jax.grad(loss)(f0)
    eps = 1e-3
    for idx in [(0, 2), (0, 9)]:
        probe = jnp.zeros_like(f0).at[idx].set(1.0)
        fd = (loss(f0 + eps * probe) - loss(f0 - eps * probe)) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(fd), rtol=3e-2, atol=1e-4)


# ---------------------------------------------------------------- Poisson/CG

def _rand_domain(rng, h=16, w=16, obstacle=True):
    mask = np.zeros((h, w), np.float32)
    if obstacle:
        mask[5:9, 6:11] = 1.0  # solid block
    return Domain2D.create(h, w, obstacle_mask=jnp.asarray(mask))


def test_cg_matches_dense(rng):
    domain = _rand_domain(rng, 12, 12)
    h, w = domain.grid_shape
    fluid = np.asarray(domain.fluid_mask)

    # Dense operator via one batched (jitted) matvec over identity columns.
    eye = jnp.eye(h * w, dtype=jnp.float32).reshape(h * w, h, w)
    a_mat = np.asarray(
        jax.jit(lambda e: masked_laplace_spd(e, domain))(eye).reshape(h * w, h * w)
    ).T
    np.testing.assert_allclose(a_mat, a_mat.T, atol=1e-5)  # symmetric
    evals = np.linalg.eigvalsh(a_mat)
    assert evals[0] > -1e-4  # PSD (one ~0 nullspace eigenvalue)

    b = rng.normal(size=(h, w)).astype(np.float32) * fluid
    b = b - (b.sum() / fluid.sum()) * fluid  # compatible rhs
    x = cg(lambda p: masked_laplace_spd(p, domain), jnp.asarray(b)[None],
           tol=1e-6, maxiter=600)[0]
    # Verify it solves the system (residual small), not x uniqueness
    # (nullspace shift allowed).
    res = np.asarray(masked_laplace_spd(x[None], domain)[0]) - b
    assert np.abs(res).max() < 1e-3


def test_measure_pressure_iterations(rng):
    """The round-4 MFU diagnostic: measure_pressure_iterations must (a)
    produce the same solution as the production solve_pressure path, (b)
    report fewer iterations warm-started from a near-solution than cold
    (the bench.py warm/cold split relies on this ordering)."""
    from pde_control_tpu.physics.poisson import (
        measure_pressure_iterations,
        solve_pressure,
    )

    domain = _rand_domain(rng, 16, 16)
    fluid = np.asarray(domain.fluid_mask)
    div = jnp.asarray(
        rng.normal(size=(2, 16, 16)).astype(np.float32) * fluid)
    p_ref = solve_pressure(div, domain, tol=1e-6, maxiter=800,
                           backend="pcg")
    p_cold, k_cold = measure_pressure_iterations(div, domain, tol=1e-6,
                                                 maxiter=800)
    # Same solution up to the shared nullspace convention (both deflated).
    np.testing.assert_allclose(np.asarray(p_cold), np.asarray(p_ref),
                               rtol=1e-3, atol=1e-4)
    p_warm, k_warm = measure_pressure_iterations(div, domain, tol=1e-6,
                                                 maxiter=800, x0=p_ref)
    assert int(k_warm) < int(k_cold), (int(k_warm), int(k_cold))
    assert int(k_warm) <= 2  # starting at the solution: ~immediate exit
    # Unpreconditioned counts must exceed preconditioned ones.
    _, k_plain = measure_pressure_iterations(div, domain, tol=1e-6,
                                             maxiter=800,
                                             precondition=False)
    assert int(k_plain) > int(k_cold), (int(k_plain), int(k_cold))


def test_projection_divergence_free(rng):
    domain = _rand_domain(rng)
    h, w = domain.grid_shape
    v = Staggered2D(
        vy=jnp.asarray(rng.normal(size=(2, h + 1, w)), jnp.float32),
        vx=jnp.asarray(rng.normal(size=(2, h, w + 1)), jnp.float32),
    )
    cfg = FluidConfig(pressure_tol=1e-7, pressure_maxiter=2000)
    v2, _ = divergence_free(v, domain, cfg)
    div = np.asarray(v2.divergence(domain.dx)) * np.asarray(domain.fluid_mask)
    assert np.abs(div).max() < 1e-4
    # Blocked faces carry no flow.
    assert np.abs(np.asarray(v2.vy) * (1 - np.asarray(domain.acc_y))).max() < 1e-6


def test_pressure_solve_grad(rng):
    # Implicit-diff VJP through custom_linear_solve vs finite differences.
    domain = _rand_domain(rng, 8, 8, obstacle=False)
    div0 = jnp.asarray(rng.normal(size=(1, 8, 8)), jnp.float32)
    div0 = div0 - div0.mean()

    def loss(div):
        p = solve_pressure(div, domain, tol=1e-6, maxiter=400)
        return jnp.sum(p * jnp.arange(64, dtype=jnp.float32).reshape(1, 8, 8))

    g = jax.jit(jax.grad(loss))(div0)
    loss_j = jax.jit(loss)
    # The solve is linear in div, so a large FD step is exact and beats the
    # iterative-solver noise floor.
    eps = 0.5
    for idx in [(0, 2, 3), (0, 6, 1)]:
        probe = jnp.zeros_like(div0).at[idx].set(1.0)
        probe = probe - probe.mean()  # stay in compatible subspace
        fd = (loss_j(div0 + eps * probe) - loss_j(div0 - eps * probe)) / (2 * eps)
        gdot = float(jnp.sum(g * probe))
        np.testing.assert_allclose(gdot, float(fd), rtol=1e-3, atol=1e-3)


def test_pressure_solve_jvp_with_warm_start(rng):
    # ADVICE r2: custom_linear_solve reuses the primal solve closure for
    # tangent systems, so with x0 set the TANGENT solve is seeded by the
    # primal warm start — a guess of unrelated scale. This pins the
    # documented contract: at production tol/maxiter the safeguarded CG
    # converges regardless of the seed, so forward mode stays correct
    # even with warm start enabled (an x0 50x the solution scale).
    domain = _rand_domain(rng, 8, 8, obstacle=True)
    div0 = jnp.asarray(rng.normal(size=(1, 8, 8)), jnp.float32)
    div0 = div0 - div0.mean()
    x0 = jnp.asarray(50.0 * rng.normal(size=(1, 8, 8)), jnp.float32)
    w = jnp.arange(64, dtype=jnp.float32).reshape(1, 8, 8)

    def loss(div):
        p = solve_pressure(div, domain, tol=1e-6, maxiter=400,
                           backend="pcg", x0=x0)
        return jnp.sum(p * w)

    tan = jnp.asarray(rng.normal(size=(1, 8, 8)), jnp.float32)
    tan = tan - tan.mean()  # stay in the compatible subspace
    _, jvp = jax.jit(lambda d, t: jax.jvp(loss, (d,), (t,)))(div0, tan)
    # Linear in div → a large FD step is exact, beating solver noise.
    loss_j = jax.jit(loss)
    eps = 0.5
    fd = (loss_j(div0 + eps * tan) - loss_j(div0 - eps * tan)) / (2 * eps)
    np.testing.assert_allclose(float(jvp), float(fd), rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------- Fluid step

def test_fluid_step_shapes_and_divfree(rng):
    h = w = 24
    domain = Domain2D.create(h, w)
    state = FluidState(
        velocity=Staggered2D(
            vy=jnp.asarray(rng.normal(size=(2, h + 1, w)) * 0.5, jnp.float32),
            vx=jnp.asarray(rng.normal(size=(2, h, w + 1)) * 0.5, jnp.float32),
        ),
        density=jnp.asarray(rng.uniform(size=(2, h, w)), jnp.float32),
    )
    cfg = FluidConfig(dt=0.5, buoyancy=0.1, pressure_tol=1e-6,
                      pressure_maxiter=1000)
    nxt = jax.jit(lambda s: fluid_step(s, domain, cfg))(state)
    assert nxt.density.shape == (2, h, w)
    div = np.asarray(nxt.velocity.divergence())
    assert np.abs(div).max() < 1e-3


def test_fluid_rollout_grad_through_projection(rng):
    # End-to-end differentiability of a short NS rollout w.r.t. a force.
    h = w = 12
    domain = Domain2D.create(h, w)
    state = FluidState.zeros(1, h, w)
    state = state.replace(density=jnp.asarray(
        rng.uniform(size=(1, h, w)), jnp.float32))
    cfg = FluidConfig(dt=0.5, buoyancy=0.05, pressure_tol=1e-8,
                      pressure_maxiter=800)
    fy0 = jnp.zeros((1, h + 1, w))

    def loss(fy):
        s = state
        force = Staggered2D(vy=fy, vx=jnp.zeros((1, h, w + 1)))
        for _ in range(3):
            s = fluid_step(s, domain, cfg, force=force)
        return jnp.sum(s.density * jnp.linspace(0, 1, h)[None, :, None])

    # VJP-vs-JVP dot test (independent AD code paths; no FD noise — the
    # shift-advection hat weights have kinks that make plain FD converge
    # slowly; verified offline in x64 that FD → grad as eps → 0).
    idx = (0, 6, 6)
    probe = jnp.zeros_like(fy0).at[idx].set(1.0)
    g, tangent = jax.jit(
        lambda p: (
            jax.grad(loss)(fy0),
            jax.jvp(loss, (fy0,), (p,))[1],
        )
    )(probe)
    np.testing.assert_allclose(float(g[idx]), float(tangent), rtol=1e-3)
    # Loose FD sanity check.
    eps = 1e-2
    loss_j = jax.jit(loss)
    fd = (loss_j(fy0 + eps * probe) - loss_j(fy0 - eps * probe)) / (2 * eps)
    np.testing.assert_allclose(float(g[idx]), float(fd), rtol=2e-1, atol=1e-3)
