"""Grid types: centered fields, staggered (MAC) velocity, and simulation domains.

TPU-native replacement for `phi/physics/field/` (`CenteredGrid`,
`StaggeredGrid`) and `phi/physics/domain.py :: Domain` [R] (SURVEY.md L2).
PhiFlow's struct system becomes plain JAX pytrees via `flax.struct.dataclass`;
centered scalar fields are raw ``(B, H, W)`` arrays — no wrapper class needed.

Coordinate convention (grid-index units, dx multiplies outside):
  * centered value  c[b, i, j]   at (y=i,     x=j)
  * y-face value    vy[b, i, j]  at (y=i-0.5, x=j),   i in 0..H
  * x-face value    vx[b, i, j]  at (y=i,     x=j-0.5), j in 0..W

so a ``Staggered2D`` over an H×W cell grid has vy: (B, H+1, W) and
vx: (B, H, W+1) — the standard MAC layout the reference's pressure
projection assumes.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from pde_control_tpu.ops.interp import bilinear_sample_2d


@flax.struct.dataclass
class Staggered2D:
    """MAC-grid velocity: vy (B, H+1, W), vx (B, H, W+1)."""

    vy: jnp.ndarray
    vx: jnp.ndarray

    @property
    def grid_shape(self) -> tuple[int, int]:
        return self.vx.shape[-2], self.vy.shape[-1]  # (H, W)

    @property
    def batch(self) -> int:
        return self.vy.shape[0]

    def at_centers(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Average face values to cell centers → (vy_c, vx_c), each (B, H, W)."""
        vy_c = 0.5 * (self.vy[:, :-1, :] + self.vy[:, 1:, :])
        vx_c = 0.5 * (self.vx[:, :, :-1] + self.vx[:, :, 1:])
        return vy_c, vx_c

    def divergence(self, dx: float = 1.0) -> jnp.ndarray:
        """Per-cell divergence, (B, H, W)."""
        dvy = self.vy[:, 1:, :] - self.vy[:, :-1, :]
        dvx = self.vx[:, :, 1:] - self.vx[:, :, :-1]
        return (dvy + dvx) / dx

    def sample_at(
        self, y: jnp.ndarray, x: jnp.ndarray, boundary: str = "clamp"
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Bilinearly sample both components at physical coords (y, x)."""
        vy = bilinear_sample_2d(self.vy, y + 0.5, x, boundary)
        vx = bilinear_sample_2d(self.vx, y, x + 0.5, boundary)
        return vy, vx

    def __add__(self, other: "Staggered2D") -> "Staggered2D":
        return Staggered2D(self.vy + other.vy, self.vx + other.vx)

    def __sub__(self, other: "Staggered2D") -> "Staggered2D":
        return Staggered2D(self.vy - other.vy, self.vx - other.vx)

    def __mul__(self, s) -> "Staggered2D":
        return Staggered2D(self.vy * s, self.vx * s)

    __rmul__ = __mul__

    @classmethod
    def zeros(cls, batch: int, h: int, w: int, dtype=jnp.float32) -> "Staggered2D":
        return cls(
            vy=jnp.zeros((batch, h + 1, w), dtype),
            vx=jnp.zeros((batch, h, w + 1), dtype),
        )


def centered_to_y_faces(c: jnp.ndarray, boundary: str = "clamp") -> jnp.ndarray:
    """Resample a centered field (B, H, W) to y-faces (B, H+1, W).

    Interior faces average adjacent cells; boundary faces replicate (clamp)
    or wrap (periodic). Used e.g. for buoyancy (density → y-face force).
    """
    mode = "wrap" if boundary == "periodic" else "edge"
    cp = jnp.pad(c, ((0, 0), (1, 1), (0, 0)), mode=mode)
    return 0.5 * (cp[:, :-1, :] + cp[:, 1:, :])


def centered_to_x_faces(c: jnp.ndarray, boundary: str = "clamp") -> jnp.ndarray:
    """Resample a centered field (B, H, W) to x-faces (B, H, W+1)."""
    mode = "wrap" if boundary == "periodic" else "edge"
    cp = jnp.pad(c, ((0, 0), (0, 0), (1, 1)), mode=mode)
    return 0.5 * (cp[:, :, :-1] + cp[:, :, 1:])


@flax.struct.dataclass
class Domain2D:
    """Simulation domain: grid size, cell size, wall boundary, obstacle masks.

    Replaces `phi/physics/domain.py :: Domain` + obstacle-mask generation in
    `phi/physics/obstacle.py` [R]. Face accessibility masks gate both the
    pressure-Poisson operator and the velocity correction, exactly where the
    reference multiplies by fluid masks.

    Attributes:
      fluid_mask: (H, W) float, 1 = fluid cell, 0 = solid/obstacle.
      acc_y: (H+1, W) float, 1 = y-face open to flow.
      acc_x: (H, W+1) float, 1 = x-face open to flow.
      dx: cell size (static).
      closed: True → solid walls (v·n = 0, Neumann pressure);
              False → open boundary (Dirichlet p = 0 at walls).
    """

    fluid_mask: jnp.ndarray
    acc_y: jnp.ndarray
    acc_x: jnp.ndarray
    dx: float = flax.struct.field(pytree_node=False, default=1.0)
    closed: bool = flax.struct.field(pytree_node=False, default=True)
    # Static structure flag (set by create()): lets the pressure solver pick
    # the exact spectral path / spectral preconditioner at trace time.
    has_obstacles: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def grid_shape(self) -> tuple[int, int]:
        return self.fluid_mask.shape[-2], self.fluid_mask.shape[-1]

    @classmethod
    def create(
        cls,
        h: int,
        w: int,
        obstacle_mask: jnp.ndarray | None = None,
        dx: float = 1.0,
        closed: bool = True,
        dtype=jnp.float32,
    ) -> "Domain2D":
        """Build a domain from an optional obstacle mask (1 = solid)."""
        if obstacle_mask is None:
            fluid = jnp.ones((h, w), dtype)
        else:
            fluid = 1.0 - obstacle_mask.astype(dtype)
        # Interior faces open iff both adjacent cells are fluid.
        acc_y_int = fluid[:-1, :] * fluid[1:, :]          # (H-1, W)
        acc_x_int = fluid[:, :-1] * fluid[:, 1:]          # (H, W-1)
        # Wall faces: blocked when closed; open-domain walls are open where
        # the adjacent edge cell is fluid.
        wall = 0.0 if closed else 1.0
        acc_y = jnp.concatenate(
            [wall * fluid[:1, :], acc_y_int, wall * fluid[-1:, :]], axis=0
        )
        acc_x = jnp.concatenate(
            [wall * fluid[:, :1], acc_x_int, wall * fluid[:, -1:]], axis=1
        )
        has_obstacles = obstacle_mask is not None and bool(
            np.any(np.asarray(obstacle_mask) > 0)
        )
        return cls(fluid_mask=fluid, acc_y=acc_y, acc_x=acc_x, dx=dx,
                   closed=closed, has_obstacles=has_obstacles)

    def mask_velocity(self, v: Staggered2D) -> Staggered2D:
        """Zero velocity on blocked faces (walls + obstacle faces)."""
        return Staggered2D(vy=v.vy * self.acc_y, vx=v.vx * self.acc_x)

    def pressure_gradient(self, p: jnp.ndarray) -> Staggered2D:
        """∇p on faces, gated by accessibility. p: (B, H, W).

        Interior face: (p_hi − p_lo)/dx. Wall faces: 0 when closed; when
        open, pressure is 0 outside so the face gradient is ±p_edge/dx.
        """
        dx = self.dx
        if self.closed:
            gy_int = (p[:, 1:, :] - p[:, :-1, :]) / dx
            zy = jnp.zeros_like(p[:, :1, :])
            gy = jnp.concatenate([zy, gy_int, zy], axis=1)
            gx_int = (p[:, :, 1:] - p[:, :, :-1]) / dx
            zx = jnp.zeros_like(p[:, :, :1])
            gx = jnp.concatenate([zx, gx_int, zx], axis=2)
        else:
            pp = jnp.pad(p, ((0, 0), (1, 1), (0, 0)))
            gy = (pp[:, 1:, :] - pp[:, :-1, :]) / dx
            pp = jnp.pad(p, ((0, 0), (0, 0), (1, 1)))
            gx = (pp[:, :, 1:] - pp[:, :, :-1]) / dx
        return Staggered2D(vy=gy * self.acc_y, vx=gx * self.acc_x)
