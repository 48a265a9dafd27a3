"""Semi-Lagrangian advection for centered and staggered fields.

Replaces `phi/physics/field/advect.py :: semi_lagrangian` [R] (SURVEY.md L2):
backtrace sample points by −dt·v, then linearly resample the advected field.

Two resampling modes:
  * ``shift``  — gather-free shifted-stencil bilinear (TPU-fast; valid when
    the CFL displacement |v·dt/dx| ≤ ``max_shift`` cells, which holds for all
    reference configs). Default.
  * ``gather`` — general take_along_axis path (correctness oracle).
"""

from __future__ import annotations

import jax.numpy as jnp

from pde_control_tpu.grids import (
    Staggered2D,
    centered_to_x_faces,
    centered_to_y_faces,
)
from pde_control_tpu.ops.interp import bilinear_sample_2d, shift_bilinear_sample_2d


def _resample_displaced(
    field: jnp.ndarray,
    disp_y: jnp.ndarray,
    disp_x: jnp.ndarray,
    mode: str,
    max_shift: int,
    boundary: str,
) -> jnp.ndarray:
    """Sample `field` at (grid + disp) with the chosen backend."""
    if mode == "shift":
        return shift_bilinear_sample_2d(field, disp_y, disp_x, max_shift, boundary)
    if mode == "gather":
        b, h, w = field.shape
        iy = jnp.arange(h, dtype=field.dtype)[None, :, None]
        ix = jnp.arange(w, dtype=field.dtype)[None, None, :]
        return bilinear_sample_2d(field, iy + disp_y, ix + disp_x, boundary)
    raise ValueError(f"unknown advection mode {mode!r}")


def advect_centered(
    c: jnp.ndarray,
    v: Staggered2D,
    dt: float,
    dx: float = 1.0,
    mode: str = "shift",
    max_shift: int = 2,
    boundary: str = "clamp",
) -> jnp.ndarray:
    """Advect a centered field (B, H, W) through velocity v for time dt."""
    vy_c, vx_c = v.at_centers()
    disp_y = -dt * vy_c / dx
    disp_x = -dt * vx_c / dx
    return _resample_displaced(c, disp_y, disp_x, mode, max_shift, boundary)


def advect_staggered(
    v: Staggered2D,
    dt: float,
    dx: float = 1.0,
    mode: str = "shift",
    max_shift: int = 2,
    boundary: str = "clamp",
) -> Staggered2D:
    """Self-advect a staggered velocity field (each component at its faces).

    The transverse velocity component at each face is approximated by
    center-averaging then face-resampling (standard MAC practice, matching
    the reference's StaggeredGrid sampling [R]).
    """
    vy_c, vx_c = v.at_centers()
    # Velocity at y-faces: vy is native; vx comes from centers.
    vx_at_y = centered_to_y_faces(vx_c, boundary="clamp")
    vy_new = _resample_displaced(
        v.vy, -dt * v.vy / dx, -dt * vx_at_y / dx, mode, max_shift, boundary
    )
    # Velocity at x-faces: vx is native; vy comes from centers.
    vy_at_x = centered_to_x_faces(vy_c, boundary="clamp")
    vx_new = _resample_displaced(
        v.vx, -dt * vy_at_x / dx, -dt * v.vx / dx, mode, max_shift, boundary
    )
    return Staggered2D(vy=vy_new, vx=vx_new)
