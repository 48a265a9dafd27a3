"""Geometry tests (VERDICT r1 item 4: geom.py had zero tests).

Covers SDF sign conventions, rasterized areas vs analytic, union semantics,
smooth edges, and the batched-parameter path used by the shape-transition
dataset (shape params as (B, 1, 1) arrays → (B, H, W) rasters).
"""

import numpy as np

import jax.numpy as jnp

from pde_control_tpu.geom import Box, Sphere, Union, rasterize, sdf_grid, union


def test_sphere_sdf_signs_and_distance():
    s = Sphere(cy=16.0, cx=16.0, r=5.0)
    d = np.asarray(sdf_grid(s, 32, 32))
    assert d[16, 16] == -5.0                      # center: -r
    assert abs(d[16, 21]) < 1e-6                  # on the boundary
    assert d[16, 26] == 10.0 - 5.0                # 10 cells out → +5
    assert (d[0, 0] > 0) and (d[16, 18] < 0)


def test_box_sdf_signs():
    b = Box(y0=4.0, x0=6.0, y1=12.0, x1=18.0)
    d = np.asarray(sdf_grid(b, 24, 24))
    assert d[8, 12] < 0                           # inside
    assert d[8, 20] == 2.0                        # 2 cells right of x1
    assert d[20, 12] == 8.0                       # 8 cells above y1
    # corner: euclidean distance
    assert abs(d[14, 20] - np.hypot(2.0, 2.0)) < 1e-5


def test_rasterize_area_matches_analytic():
    h = w = 64
    circle = rasterize(Sphere(cy=32.0, cx=32.0, r=10.0), h, w)
    assert abs(float(circle.sum()) - np.pi * 100) / (np.pi * 100) < 0.05
    box = rasterize(Box(y0=10.0, x0=20.0, y1=30.0, x1=50.0), h, w)
    # half-open convention: area counts cell centers inside [y0,y1)x[x0,x1)
    assert abs(float(box.sum()) - 20 * 30) <= 51  # boundary cells ±1 row/col


def test_union_is_min_of_sdfs():
    a, b = Sphere(cy=8.0, cx=8.0, r=3.0), Sphere(cy=8.0, cx=20.0, r=3.0)
    u = union(a, b)
    assert isinstance(u, Union)
    d = np.asarray(sdf_grid(u, 16, 28))
    np.testing.assert_allclose(
        d, np.minimum(np.asarray(sdf_grid(a, 16, 28)),
                      np.asarray(sdf_grid(b, 16, 28))))
    mask = np.asarray(rasterize(u, 16, 28))
    assert mask[8, 8] == 1 and mask[8, 20] == 1 and mask[8, 14] == 0


def test_rasterize_smooth_edge():
    m = np.asarray(rasterize(Sphere(cy=16.0, cx=16.0, r=6.0), 32, 32,
                             smooth=2.0))
    assert m.max() == 1.0 and m.min() == 0.0
    assert ((m > 0) & (m < 1)).sum() > 0          # a soft band exists
    assert m[16, 16] == 1.0 and m[0, 0] == 0.0


def test_batched_shape_params_broadcast():
    # (B, 1, 1) params → (B, H, W) raster, one call for the whole batch.
    cy = jnp.array([8.0, 16.0])[:, None, None]
    cx = jnp.array([8.0, 24.0])[:, None, None]
    r = jnp.array([3.0, 5.0])[:, None, None]
    m = np.asarray(rasterize(Sphere(cy=cy, cx=cx, r=r), 32, 32))
    assert m.shape == (2, 32, 32)
    assert m[0, 8, 8] == 1 and m[0, 16, 24] == 0
    assert m[1, 16, 24] == 1 and m[1, 8, 8] == 0


def test_random_shape_densities():
    import jax

    from pde_control_tpu.data.generate import random_shape_densities

    d = np.asarray(random_shape_densities(jax.random.PRNGKey(0), 8, 64, 64))
    assert d.shape == (8, 64, 64)
    assert d.min() >= 0.0 and d.max() <= 1.0
    areas = d.reshape(8, -1).sum(1)
    assert (areas > 20).all(), areas  # every sample contains a real shape
