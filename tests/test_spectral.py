"""Spectral (matmul-DCT) Poisson solve tests — against the CG oracle."""

import numpy as np

import jax
import jax.numpy as jnp

from pde_control_tpu.grids import Domain2D
from pde_control_tpu.ops.spectral import (
    dct2_2d,
    idct2_2d,
    spectral_neumann_solve,
)
from pde_control_tpu.physics.poisson import masked_laplace_spd, solve_pressure


def test_dct_roundtrip_and_orthonormal(rng):
    x = jnp.asarray(rng.normal(size=(3, 16, 24)), jnp.float32)
    y = idct2_2d(dct2_2d(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
    # Parseval: orthonormal transform preserves the L2 norm.
    np.testing.assert_allclose(float(jnp.sum(dct2_2d(x) ** 2)),
                               float(jnp.sum(x**2)), rtol=1e-5)


def test_spectral_solve_is_exact(rng):
    # The DCT diagonalization must match the masked operator exactly on a
    # closed, obstacle-free domain.
    dom = Domain2D.create(16, 16)
    b = jnp.asarray(rng.normal(size=(2, 16, 16)), jnp.float32)
    b = b - b.mean(axis=(1, 2), keepdims=True)
    p = spectral_neumann_solve(b)
    res = np.asarray(masked_laplace_spd(p, dom)) - np.asarray(b)
    assert np.abs(res).max() < 1e-4


def test_auto_backend_spectral_matches_cg(rng):
    dom = Domain2D.create(16, 16)
    assert not dom.has_obstacles
    div = jnp.asarray(rng.normal(size=(2, 16, 16)), jnp.float32)
    p_cg = solve_pressure(div, dom, tol=1e-7, maxiter=800, backend="jax")
    p_sp = solve_pressure(div, dom, backend="spectral")
    np.testing.assert_allclose(np.asarray(p_sp), np.asarray(p_cg), atol=2e-3)
    # 'auto' on a closed obstacle-free domain routes to spectral.
    p_auto = solve_pressure(div, dom, backend="auto")
    np.testing.assert_allclose(np.asarray(p_auto), np.asarray(p_sp), atol=1e-6)


def test_pcg_with_obstacles_matches_cg(rng):
    m = np.zeros((16, 16), np.float32)
    m[5:9, 6:11] = 1.0
    dom = Domain2D.create(16, 16, obstacle_mask=jnp.asarray(m))
    assert dom.has_obstacles
    div = jnp.asarray(rng.normal(size=(2, 16, 16)), jnp.float32)
    p_cg = solve_pressure(div, dom, tol=1e-7, maxiter=1000, backend="jax")
    p_pcg = solve_pressure(div, dom, tol=1e-7, maxiter=1000, backend="pcg")
    np.testing.assert_allclose(np.asarray(p_pcg), np.asarray(p_cg), atol=5e-3)


def test_pcg_grad_flows(rng):
    m = np.zeros((16, 16), np.float32)
    m[4:6, 4:12] = 1.0
    dom = Domain2D.create(16, 16, obstacle_mask=jnp.asarray(m))
    div0 = jnp.asarray(rng.normal(size=(1, 16, 16)), jnp.float32)
    wgt = jnp.asarray(rng.normal(size=(1, 16, 16)), jnp.float32)

    def loss(d, backend):
        return jnp.sum(solve_pressure(d, dom, tol=1e-6, maxiter=500,
                                      backend=backend) * wgt)

    g_cg = jax.jit(jax.grad(lambda d: loss(d, "jax")))(div0)
    g_pcg = jax.jit(jax.grad(lambda d: loss(d, "pcg")))(div0)
    np.testing.assert_allclose(np.asarray(g_pcg), np.asarray(g_cg),
                               rtol=1e-2, atol=1e-3)


def test_open_domain_spectral_exact(rng):
    dom = Domain2D.create(16, 16, closed=False)
    div = jnp.asarray(rng.normal(size=(2, 16, 16)), jnp.float32)
    p_cg = solve_pressure(div, dom, tol=1e-7, maxiter=800, backend="jax")
    p_sp = solve_pressure(div, dom, backend="spectral")
    np.testing.assert_allclose(np.asarray(p_sp), np.asarray(p_cg), atol=2e-3)
    # residual check against the actual masked operator
    b = np.asarray(-div)
    res = np.asarray(masked_laplace_spd(p_sp, dom)) - b
    assert np.abs(res).max() < 1e-3
    # 'auto' on an open obstacle-free domain routes to spectral
    p_auto = solve_pressure(div, dom, backend="auto")
    np.testing.assert_allclose(np.asarray(p_auto), np.asarray(p_sp), atol=1e-6)
