"""Property-based tests (hypothesis) for the numerics core — SURVEY.md §4
item 1: "grid ops, interpolation, stencils — property tests".

Kept to a few high-value invariants with small deadlines (jit-free paths or
cached compilations) so the suite stays fast.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from pde_control_tpu.grids import Domain2D, Staggered2D
from pde_control_tpu.ops.interp import linear_sample_1d, shift_bilinear_sample_2d
from pde_control_tpu.ops.stencils import laplace

_settings = settings(max_examples=20, deadline=None)


@_settings
@given(st.integers(0, 2**31 - 1), st.sampled_from([8, 12, 16]))
def test_laplace_annihilates_constants_and_sums_to_zero(seed, n):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(1, n, n)), jnp.float32)
    # Periodic laplacian output always sums to zero (telescoping).
    lap = laplace(u, boundary="periodic")
    assert abs(float(lap.sum())) < 1e-3
    # Constants are annihilated under every boundary mode.
    c = jnp.full((1, n, n), float(rng.normal()))
    for mode in ("periodic", "neumann"):
        assert float(jnp.abs(laplace(c, boundary=mode)).max()) < 1e-5


@_settings
@given(st.integers(0, 2**31 - 1))
def test_linear_sample_is_interpolatory_and_bounded(seed):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 15, size=(2, 7)), jnp.float32)
    out = np.asarray(linear_sample_1d(f, x, "clamp"))
    # Linear interpolation never exceeds the data range (maximum principle).
    assert out.max() <= float(f.max()) + 1e-6
    assert out.min() >= float(f.min()) - 1e-6


@_settings
@given(st.integers(0, 2**31 - 1))
def test_shift_sample_partition_of_unity(seed):
    # Sampling a constant field at any in-bound displacement returns the
    # constant exactly (hat weights form a partition of unity).
    rng = np.random.default_rng(seed)
    c = float(rng.normal())
    f = jnp.full((1, 12, 12), c, jnp.float32)
    dy = jnp.asarray(rng.uniform(-2, 2, size=(1, 12, 12)), jnp.float32)
    dx = jnp.asarray(rng.uniform(-2, 2, size=(1, 12, 12)), jnp.float32)
    out = shift_bilinear_sample_2d(f, dy, dx, max_shift=2, boundary="clamp")
    np.testing.assert_allclose(np.asarray(out), c, atol=1e-5)


@_settings
@given(st.integers(0, 2**31 - 1))
def test_divergence_gradient_adjointness(seed):
    # ⟨grad p, v⟩_faces = ⟨p, -div v⟩_cells for the acc-gated operators on a
    # closed domain — the discrete integration-by-parts identity that makes
    # the pressure operator symmetric.
    rng = np.random.default_rng(seed)
    h = w = 10
    m = np.zeros((h, w), np.float32)
    m[rng.integers(1, h - 2), rng.integers(1, w - 2)] = 1.0  # random solid
    dom = Domain2D.create(h, w, obstacle_mask=jnp.asarray(m))
    p = jnp.asarray(rng.normal(size=(1, h, w)), jnp.float32)
    v = Staggered2D(
        vy=jnp.asarray(rng.normal(size=(1, h + 1, w)), jnp.float32),
        vx=jnp.asarray(rng.normal(size=(1, h, w + 1)), jnp.float32),
    )
    v = dom.mask_velocity(v)
    g = dom.pressure_gradient(p)
    lhs = float(jnp.sum(g.vy * v.vy) + jnp.sum(g.vx * v.vx))
    rhs = float(jnp.sum(p * (-v.divergence())))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-4)
