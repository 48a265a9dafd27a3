"""Unit tests for stencils and interpolation (SURVEY.md §4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from pde_control_tpu.ops.interp import (
    bilinear_sample_2d,
    linear_sample_1d,
    shift_bilinear_sample_2d,
)
from pde_control_tpu.ops.stencils import laplace


def test_laplace_periodic_sine():
    # ∇² sin(kx) = -k² sin(kx); FD laplace ≈ analytic for smooth fields.
    n = 128
    x = jnp.arange(n) * (2 * jnp.pi / n)
    u = jnp.sin(x)[None]
    dx = float(2 * jnp.pi / n)
    lap = laplace(u, dx=dx, boundary="periodic")
    np.testing.assert_allclose(np.asarray(lap), -np.asarray(u), atol=1e-2)


def test_laplace_neumann_constant_is_zero():
    u = jnp.full((2, 16, 16), 3.7)
    lap = laplace(u, boundary="neumann")
    np.testing.assert_allclose(np.asarray(lap), 0.0, atol=1e-6)


def test_linear_sample_identity_and_shift(rng):
    field = jnp.asarray(rng.normal(size=(3, 32)), jnp.float32)
    x = jnp.tile(jnp.arange(32, dtype=jnp.float32)[None], (3, 1))
    out = linear_sample_1d(field, x, "periodic")
    np.testing.assert_allclose(np.asarray(out), np.asarray(field), atol=1e-6)
    # half-cell shift = average of neighbors (periodic)
    out = linear_sample_1d(field, x + 0.5, "periodic")
    expect = 0.5 * (np.asarray(field) + np.roll(np.asarray(field), -1, axis=-1))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_bilinear_identity(rng):
    f = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
    iy = jnp.tile(jnp.arange(8, dtype=jnp.float32)[None, :, None], (2, 1, 16))
    ix = jnp.tile(jnp.arange(16, dtype=jnp.float32)[None, None, :], (2, 8, 1))
    out = bilinear_sample_2d(f, iy, ix, "clamp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-6)


def test_shift_matches_gather(rng):
    # The TPU fast path must agree exactly with the gather oracle in-bounds.
    f = jnp.asarray(rng.normal(size=(2, 16, 16)), jnp.float32)
    dy = jnp.asarray(rng.uniform(-1.9, 1.9, size=(2, 16, 16)), jnp.float32)
    dx = jnp.asarray(rng.uniform(-1.9, 1.9, size=(2, 16, 16)), jnp.float32)
    for boundary in ("clamp", "periodic"):
        iy = jnp.arange(16, dtype=jnp.float32)[None, :, None] + dy
        ix = jnp.arange(16, dtype=jnp.float32)[None, None, :] + dx
        ref = bilinear_sample_2d(f, iy, ix, boundary)
        fast = shift_bilinear_sample_2d(f, dy, dx, max_shift=2, boundary=boundary)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)


def test_shift_sample_grad(rng):
    # Differentiability through the displacement (what backprop-through-
    # advection needs): finite difference vs jax.grad.
    f = jnp.asarray(rng.normal(size=(1, 8, 8)), jnp.float32)
    dy0 = jnp.asarray(rng.uniform(-1, 1, size=(1, 8, 8)), jnp.float32)
    dx0 = jnp.asarray(rng.uniform(-1, 1, size=(1, 8, 8)), jnp.float32)

    def loss(dy):
        return jnp.sum(shift_bilinear_sample_2d(f, dy, dx0, 2, "clamp") ** 2)

    g = jax.grad(loss)(dy0)
    eps = 1e-3
    probe = jnp.zeros_like(dy0).at[0, 3, 4].set(1.0)
    fd = (loss(dy0 + eps * probe) - loss(dy0 - eps * probe)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 3, 4]), float(fd), rtol=2e-2, atol=1e-4)
