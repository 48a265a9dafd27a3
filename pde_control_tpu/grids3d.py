"""3D grid types: staggered (MAC) velocity and simulation domains.

Extends the 2D core (grids.py) to volumes — the capability analog of
PhiFlow's dimension-general `CenteredGrid`/`StaggeredGrid`/`Domain`
(`phi/physics/field/` [R], which handle 3D smoke out of the box; the
PDE-Control experiments themselves are 1D/2D, so this module is
beyond-reference capability, built so a PhiFlow user's 3D workloads have a
home here too).

Coordinate convention (grid-index units; z is "up" — buoyancy acts on vz):
  * centered value  c[b, k, i, j]   at (z=k,     y=i,     x=j)
  * z-face value    vz[b, k, i, j]  at (z=k-0.5, y=i,     x=j),   k in 0..D
  * y-face value    vy[b, k, i, j]  at (z=k,     y=i-0.5, x=j),   i in 0..H
  * x-face value    vx[b, k, i, j]  at (z=k,     y=i,     x=j-0.5), j in 0..W

so a ``Staggered3D`` over a D×H×W cell grid has vz: (B, D+1, H, W),
vy: (B, D, H+1, W), vx: (B, D, H, W+1) — the MAC layout the masked
pressure projection assumes, exactly as in 2D.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Staggered3D:
    """MAC-grid velocity: vz (B, D+1, H, W), vy (B, D, H+1, W),
    vx (B, D, H, W+1)."""

    vz: jnp.ndarray
    vy: jnp.ndarray
    vx: jnp.ndarray

    @property
    def grid_shape(self) -> tuple[int, int, int]:
        return self.vy.shape[-3], self.vx.shape[-2], self.vz.shape[-1]

    @property
    def batch(self) -> int:
        return self.vz.shape[0]

    def at_centers(self) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Average face values to cell centers → (vz_c, vy_c, vx_c)."""
        vz_c = 0.5 * (self.vz[:, :-1] + self.vz[:, 1:])
        vy_c = 0.5 * (self.vy[:, :, :-1] + self.vy[:, :, 1:])
        vx_c = 0.5 * (self.vx[:, :, :, :-1] + self.vx[:, :, :, 1:])
        return vz_c, vy_c, vx_c

    def divergence(self, dx: float = 1.0) -> jnp.ndarray:
        """Per-cell divergence, (B, D, H, W)."""
        dvz = self.vz[:, 1:] - self.vz[:, :-1]
        dvy = self.vy[:, :, 1:] - self.vy[:, :, :-1]
        dvx = self.vx[:, :, :, 1:] - self.vx[:, :, :, :-1]
        return (dvz + dvy + dvx) / dx

    def __add__(self, other: "Staggered3D") -> "Staggered3D":
        return Staggered3D(self.vz + other.vz, self.vy + other.vy,
                           self.vx + other.vx)

    def __sub__(self, other: "Staggered3D") -> "Staggered3D":
        return Staggered3D(self.vz - other.vz, self.vy - other.vy,
                           self.vx - other.vx)

    def __mul__(self, s) -> "Staggered3D":
        return Staggered3D(self.vz * s, self.vy * s, self.vx * s)

    __rmul__ = __mul__

    @classmethod
    def zeros(cls, batch: int, d: int, h: int, w: int,
              dtype=jnp.float32) -> "Staggered3D":
        return cls(
            vz=jnp.zeros((batch, d + 1, h, w), dtype),
            vy=jnp.zeros((batch, d, h + 1, w), dtype),
            vx=jnp.zeros((batch, d, h, w + 1), dtype),
        )


def _face_resample(c: jnp.ndarray, axis: int, boundary: str) -> jnp.ndarray:
    """Centered (B, D, H, W) → faces along `axis` (size+1 there)."""
    mode = "wrap" if boundary == "periodic" else "edge"
    pad = [(0, 0)] * c.ndim
    pad[axis] = (1, 1)
    cp = jnp.pad(c, pad, mode=mode)
    lo = [slice(None)] * c.ndim
    hi = [slice(None)] * c.ndim
    lo[axis] = slice(None, -1)
    hi[axis] = slice(1, None)
    return 0.5 * (cp[tuple(lo)] + cp[tuple(hi)])


def centered_to_z_faces(c: jnp.ndarray, boundary: str = "clamp") -> jnp.ndarray:
    return _face_resample(c, 1, boundary)


def centered_to_y_faces_3d(c: jnp.ndarray, boundary: str = "clamp") -> jnp.ndarray:
    return _face_resample(c, 2, boundary)


def centered_to_x_faces_3d(c: jnp.ndarray, boundary: str = "clamp") -> jnp.ndarray:
    return _face_resample(c, 3, boundary)


@flax.struct.dataclass
class Domain3D:
    """3D simulation domain; duck-type-compatible with physics/poisson.py
    (`solve_pressure`/`masked_laplace_spd` only use `fluid_mask`,
    `pressure_gradient`, `.divergence`, `dx`, `closed`, `has_obstacles`).

    Attributes:
      fluid_mask: (D, H, W) float, 1 = fluid cell, 0 = solid/obstacle.
      acc_z/acc_y/acc_x: face accessibility (1 = open to flow), shaped like
        the corresponding Staggered3D component (minus batch).
    """

    fluid_mask: jnp.ndarray
    acc_z: jnp.ndarray
    acc_y: jnp.ndarray
    acc_x: jnp.ndarray
    dx: float = flax.struct.field(pytree_node=False, default=1.0)
    closed: bool = flax.struct.field(pytree_node=False, default=True)
    has_obstacles: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def grid_shape(self) -> tuple[int, int, int]:
        return (self.fluid_mask.shape[-3], self.fluid_mask.shape[-2],
                self.fluid_mask.shape[-1])

    @classmethod
    def create(
        cls,
        d: int,
        h: int,
        w: int,
        obstacle_mask: jnp.ndarray | None = None,
        dx: float = 1.0,
        closed: bool = True,
        dtype=jnp.float32,
    ) -> "Domain3D":
        """Build a domain from an optional (D, H, W) obstacle mask (1=solid)."""
        if obstacle_mask is None:
            fluid = jnp.ones((d, h, w), dtype)
        else:
            fluid = 1.0 - obstacle_mask.astype(dtype)
        wall = 0.0 if closed else 1.0

        def acc(axis: int) -> jnp.ndarray:
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[axis] = slice(None, -1)
            hi[axis] = slice(1, None)
            interior = fluid[tuple(lo)] * fluid[tuple(hi)]
            first = [slice(None)] * 3
            last = [slice(None)] * 3
            first[axis] = slice(None, 1)
            last[axis] = slice(-1, None)
            return jnp.concatenate(
                [wall * fluid[tuple(first)], interior,
                 wall * fluid[tuple(last)]], axis=axis)

        has_obstacles = obstacle_mask is not None and bool(
            np.any(np.asarray(obstacle_mask) > 0))
        return cls(fluid_mask=fluid, acc_z=acc(0), acc_y=acc(1),
                   acc_x=acc(2), dx=dx, closed=closed,
                   has_obstacles=has_obstacles)

    def mask_velocity(self, v: Staggered3D) -> Staggered3D:
        """Zero velocity on blocked faces (walls + obstacle faces)."""
        return Staggered3D(vz=v.vz * self.acc_z, vy=v.vy * self.acc_y,
                           vx=v.vx * self.acc_x)

    def pressure_gradient(self, p: jnp.ndarray) -> Staggered3D:
        """∇p on faces, gated by accessibility. p: (B, D, H, W)."""
        dx = self.dx

        def grad(axis: int) -> jnp.ndarray:
            if self.closed:
                lo = [slice(None)] * 4
                hi = [slice(None)] * 4
                lo[axis] = slice(None, -1)
                hi[axis] = slice(1, None)
                g_int = (p[tuple(hi)] - p[tuple(lo)]) / dx
                zshape = list(p.shape)
                zshape[axis] = 1
                z = jnp.zeros(zshape, p.dtype)
                return jnp.concatenate([z, g_int, z], axis=axis)
            pad = [(0, 0)] * 4
            pad[axis] = (1, 1)
            pp = jnp.pad(p, pad)
            lo = [slice(None)] * 4
            hi = [slice(None)] * 4
            lo[axis] = slice(None, -1)
            hi[axis] = slice(1, None)
            return (pp[tuple(hi)] - pp[tuple(lo)]) / dx

        return Staggered3D(vz=grad(1) * self.acc_z, vy=grad(2) * self.acc_y,
                           vx=grad(3) * self.acc_x)
