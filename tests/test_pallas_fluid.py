"""Fused whole-step Pallas kernel vs the XLA fluid_step oracle.

Pins forward AND hand-written-VJP equality (ops/pallas_fluid.py) against
physics/fluid.py on CPU in interpret mode: obstacle + no-obstacle domains,
force/inflow/warm-start operand combinations, the v = 0 subgradient tie
points, and the production composition (fluid_step dispatch + lax.scan +
remat).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pde_control_tpu.grids import Domain2D, Staggered2D
from pde_control_tpu.ops.pallas_fluid import fused_fluid_step, fused_step_fits
from pde_control_tpu.physics.fluid import FluidConfig, FluidState, fluid_step

H = 16
B = 2


def _domain(obstacles: bool) -> Domain2D:
    mask = None
    if obstacles:
        m = np.zeros((H, H), np.float32)
        m[H // 2, 4:10] = 1.0
        mask = jnp.asarray(m)
    return Domain2D.create(H, H, obstacle_mask=mask)


def _rand(rng, *shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


def _steps(dom, cfg, with_force, with_inflow, x0):
    """(xla_step, fused_step) closures over identical inputs."""

    def xla(vy, vx, rho, fy, fx, inflow):
        st = FluidState(velocity=Staggered2D(vy=vy, vx=vx), density=rho,
                        inflow=inflow, pressure=x0)
        force = Staggered2D(vy=fy, vx=fx) if with_force else None
        out = fluid_step(st, dom, cfg, force=force)
        return out.velocity.vy, out.velocity.vx, out.density

    def fused(vy, vx, rho, fy, fx, inflow):
        o = fused_fluid_step(
            vy, vx, rho, dom.acc_y, dom.acc_x, dom.fluid_mask,
            fy=fy if with_force else None, fx=fx if with_force else None,
            inflow=inflow if with_inflow else None, x0=x0,
            dt=cfg.dt, dx=dom.dx, max_shift=cfg.max_shift,
            buoyancy=cfg.buoyancy, closed=True, tol=cfg.pressure_tol,
            maxiter=cfg.pressure_maxiter, interpret=True)
        return o[0], o[1], o[2]

    return xla, fused


@pytest.mark.parametrize(
    "obstacles,with_force,with_inflow,warm,zero_v",
    [
        (True, True, True, False, False),
        (False, False, False, True, False),
        (False, False, False, False, True),  # v=0 subgradient tie points
    ],
)
def test_fused_step_matches_oracle(rng, obstacles, with_force, with_inflow,
                                   warm, zero_v):
    dom = _domain(obstacles)
    cfg = FluidConfig(dt=0.7, buoyancy=0.08, pressure_tol=1e-6,
                      pressure_maxiter=400, fused="off")
    if zero_v:
        vy, vx = jnp.zeros((B, H + 1, H)), jnp.zeros((B, H, H + 1))
    else:
        vy = _rand(rng, B, H + 1, H, scale=0.5)
        vx = _rand(rng, B, H, H + 1, scale=0.5)
    rho = jnp.asarray(rng.random((B, H, H)).astype(np.float32))
    fy = _rand(rng, B, H + 1, H, scale=0.1)
    fx = _rand(rng, B, H, H + 1, scale=0.1)
    inflow = (jnp.asarray(rng.random((B, H, H)).astype(np.float32) * 0.05)
              if with_inflow else None)
    x0 = _rand(rng, B, H, H, scale=0.1) if warm else None

    xla, fused = _steps(dom, cfg, with_force, with_inflow, x0)
    a = jax.jit(xla)(vy, vx, rho, fy, fx, inflow)
    b = jax.jit(fused)(vy, vx, rho, fy, fx, inflow)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=5e-6, rtol=1e-5)

    cots = tuple(_rand(rng, *np.asarray(t).shape) for t in a)

    def scalar(step):
        def f(args):
            out = step(*args, fy, fx, inflow)
            return sum(jnp.vdot(c, o) for c, o in zip(cots, out))

        return f

    args = (vy, vx, rho)
    g_a = jax.jit(jax.grad(scalar(xla)))(args)
    g_b = jax.jit(jax.grad(scalar(fused)))(args)
    for x, y in zip(g_a, g_b):
        scale = float(jnp.max(jnp.abs(x))) + 1e-9
        np.testing.assert_allclose(np.asarray(x) / scale,
                                   np.asarray(y) / scale,
                                   atol=3e-5)


def test_fused_dispatch_in_rollout_matches(rng):
    """Production composition: fluid_step's fused dispatch under lax.scan +
    remat, training-style force gradient equality vs the XLA path."""
    dom = _domain(True)
    kw = dict(dt=1.0, buoyancy=0.05, pressure_tol=1e-6,
              pressure_maxiter=400, warm_start_pressure=True)
    cfg_x = FluidConfig(fused="off", **kw)
    cfg_f = FluidConfig(fused="pallas", **kw)
    rho0 = jnp.asarray(rng.random((B, H, H)).astype(np.float32))
    fy = _rand(rng, B, H + 1, H, scale=0.05)
    fx = _rand(rng, B, H, H + 1, scale=0.05)
    target = jnp.asarray(rng.random((B, H, H)).astype(np.float32))

    def loss(cfg):
        def f(params):
            fy, fx = params
            force = Staggered2D(vy=fy, vx=fx)
            st = FluidState(velocity=Staggered2D.zeros(B, H, H),
                            density=rho0,
                            pressure=jnp.zeros((B, H, H)))

            def body(s, _):
                return fluid_step(s, dom, cfg, force=force), None

            body = jax.checkpoint(body)
            st, _ = jax.lax.scan(body, st, None, length=3)
            return jnp.mean((st.density - target) ** 2)

        return f

    la, ga = jax.jit(jax.value_and_grad(loss(cfg_x)))((fy, fx))
    lb, gb = jax.jit(jax.value_and_grad(loss(cfg_f)))((fy, fx))
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for x, y in zip(ga, gb):
        scale = float(jnp.max(jnp.abs(x))) + 1e-9
        np.testing.assert_allclose(np.asarray(x) / scale,
                                   np.asarray(y) / scale, atol=3e-5)


def test_fused_fits_gate():
    assert fused_step_fits(64, 64)
    assert fused_step_fits(128, 128)
    assert not fused_step_fits(1024, 1024)


def test_advect_window_T_jnp_path_matches_autodiff(rng):
    """The scratch-free (plain-jnp) branch of _advect_window_T — unused by
    the kernels, which pass a VMEM scratch — pinned against jax.vjp of the
    forward window so the advertised plain-jnp reuse path is verified."""
    from pde_control_tpu.ops.pallas_fluid import (
        _advect_window,
        _advect_window_T,
    )

    k = 2
    f = jnp.asarray(rng.random((H, H)).astype(np.float32))
    dy = jnp.asarray((rng.random((H, H)) * 3 - 1.5).astype(np.float32))
    dx_ = jnp.asarray((rng.random((H, H)) * 3 - 1.5).astype(np.float32))
    g = jnp.asarray(rng.random((H, H)).astype(np.float32))

    out, vjp = jax.vjp(lambda *a: _advect_window(*a, k), f, dy, dx_)
    want = vjp(g)
    got = _advect_window_T(g, f, dy, dx_, k)  # scratch=None -> jnp branch
    for w, h_ in zip(want, got):
        np.testing.assert_allclose(np.asarray(w), np.asarray(h_),
                                   atol=2e-5, rtol=1e-5)
