"""Geometry primitives → grid masks.

Rebuild of `phi/geom/` (`Box`, `Sphere`, `union`) [R] (SURVEY.md §2b
"geometry"): shapes rasterize to cell-centered occupancy masks (and signed
distance fields) used for obstacles, initial smoke shapes, and force-mask
regions. Cell (i, j) has its center at (y=i, x=j) in grid-index units —
the same convention as grids.py.

Everything returns plain jnp arrays; shapes are lightweight dataclasses
(geometry is static trace-time data, not pytree state).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Box:
    """Axis-aligned box: [y0, y1) × [x0, x1) in grid-index units."""

    y0: float
    x0: float
    y1: float
    x1: float

    def sdf(self, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        cy = (self.y0 + self.y1) / 2.0
        cx = (self.x0 + self.x1) / 2.0
        hy = (self.y1 - self.y0) / 2.0
        hx = (self.x1 - self.x0) / 2.0
        dy = jnp.abs(y - cy) - hy
        dx = jnp.abs(x - cx) - hx
        outside = jnp.sqrt(jnp.maximum(dy, 0) ** 2 + jnp.maximum(dx, 0) ** 2)
        inside = jnp.minimum(jnp.maximum(dy, dx), 0)
        return outside + inside


@dataclasses.dataclass(frozen=True)
class Sphere:
    """Circle (2D sphere): center (cy, cx), radius r, grid-index units."""

    cy: float
    cx: float
    r: float

    def sdf(self, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.sqrt((y - self.cy) ** 2 + (x - self.cx) ** 2) - self.r


@dataclasses.dataclass(frozen=True)
class Union:
    """Union of shapes (min of SDFs) — `phi.geom.union` analog."""

    shapes: tuple

    def sdf(self, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        d = self.shapes[0].sdf(y, x)
        for s in self.shapes[1:]:
            d = jnp.minimum(d, s.sdf(y, x))
        return d


def union(*shapes) -> Union:
    return Union(tuple(shapes))


def _grid_coords(h: int, w: int):
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    return jnp.broadcast_to(y, (h, w)), jnp.broadcast_to(x, (h, w))


def rasterize(shape, h: int, w: int, smooth: float = 0.0) -> jnp.ndarray:
    """Occupancy mask (H, W): 1 inside the shape, 0 outside.

    smooth > 0 gives a soft edge of that width (useful for differentiable
    initial-density shapes; obstacles should stay hard, smooth=0).
    """
    y, x = _grid_coords(h, w)
    d = shape.sdf(y, x)
    if smooth > 0:
        return jnp.clip(0.5 - d / smooth, 0.0, 1.0)
    # Boundary-INCLUSIVE (closed interval): a cell center lying exactly on
    # the SDF zero level set rasterizes solid. Consequence: a Box spanning
    # [y0, y1] covers (y1 - y0 + 1) rows when both bounds land on integer
    # cell centers — size shapes so boundaries fall between centers when
    # an exact cell count matters (e.g. 64²'s 0.45·h = 28.8 plate).
    return (d <= 0).astype(jnp.float32)


def sdf_grid(shape, h: int, w: int) -> jnp.ndarray:
    """Signed distance sampled at cell centers (H, W)."""
    y, x = _grid_coords(h, w)
    return shape.sdf(y, x)
