"""3D incompressible Navier-Stokes step (smoke): semi-Lagrangian advection,
buoyancy, masked pressure projection.

Volume analog of physics/fluid.py (the PhiFlow `IncompressibleFlow.step`
pipeline [R], which is dimension-general; the PDE-Control experiments are
1D/2D, so 3D is beyond-reference capability). Operation order matches the
2D step exactly: advect density+velocity → diffuse → apply effects
(force/inflow/buoyancy) → divergence_free.

The pressure solve reuses physics/poisson.py verbatim — `cg`,
`masked_laplace_spd`, `solve_pressure`, and the implicit-diff
custom_linear_solve are all dimension-agnostic; Domain3D duck-types the
Domain2D surface they touch. Physics stays fp32 (CLAUDE.md invariant).
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax.numpy as jnp

from pde_control_tpu.grids3d import (
    Domain3D,
    Staggered3D,
    centered_to_x_faces_3d,
    centered_to_y_faces_3d,
    centered_to_z_faces,
)
from pde_control_tpu.ops.interp3d import (
    shift_trilinear_sample_3d,
    trilinear_sample_3d,
)
from pde_control_tpu.physics.poisson import solve_pressure


@flax.struct.dataclass
class FluidState3D:
    """velocity: 3D MAC grid; density: (B, D, H, W) passive smoke marker;
    inflow: optional continuous source rate (dt·inflow added per step);
    pressure: optional previous step's pressure for CG warm starts —
    the same state contract as the 2D FluidState."""

    velocity: Staggered3D
    density: jnp.ndarray
    inflow: jnp.ndarray | None = None
    pressure: jnp.ndarray | None = None

    @classmethod
    def zeros(cls, batch: int, d: int, h: int, w: int, dtype=jnp.float32,
              with_inflow: bool = False) -> "FluidState3D":
        return cls(
            velocity=Staggered3D.zeros(batch, d, h, w, dtype),
            density=jnp.zeros((batch, d, h, w), dtype),
            inflow=jnp.zeros((batch, d, h, w), dtype) if with_inflow else None,
        )


@dataclasses.dataclass(frozen=True)
class Fluid3DConfig:
    """Static solver parameters for the 3D NS step (trace-time constants)."""

    dt: float = 1.0
    viscosity: float = 0.0
    buoyancy: float = 0.1          # upward force per unit density (z+ is up)
    advection_mode: str = "shift"  # 'shift' (TPU-fast) | 'gather'
    max_shift: int = 1             # CFL bound; window is (2K+2)³ terms in 3D
    pressure_tol: float = 1e-5
    pressure_maxiter: int = 500
    # 'auto' | 'jax' (masked CG) | 'spectral' (exact matmul-DCT/DST solve,
    # obstacle-free domains) | 'pcg' (spectrally-preconditioned CG). 'auto'
    # picks spectral/pcg by obstacle structure; the fused Pallas kernel is
    # 2D-only (poisson._pick_backend).
    pressure_backend: str = "auto"
    warm_start_pressure: bool = False


def _resample_displaced_3d(field, dz, dy, dx_, mode, max_shift, boundary):
    if mode == "shift":
        return shift_trilinear_sample_3d(field, dz, dy, dx_, max_shift,
                                         boundary)
    if mode == "gather":
        b, d, h, w = field.shape
        iz = jnp.arange(d, dtype=field.dtype)[None, :, None, None]
        iy = jnp.arange(h, dtype=field.dtype)[None, None, :, None]
        ix = jnp.arange(w, dtype=field.dtype)[None, None, None, :]
        return trilinear_sample_3d(field, iz + dz, iy + dy, ix + dx_,
                                   boundary)
    raise ValueError(f"unknown advection mode {mode!r}")


def advect_centered_3d(
    c: jnp.ndarray,
    v: Staggered3D,
    dt: float,
    dx: float = 1.0,
    mode: str = "shift",
    max_shift: int = 1,
    boundary: str = "clamp",
) -> jnp.ndarray:
    """Advect a centered field (B, D, H, W) through velocity v for time dt."""
    vz_c, vy_c, vx_c = v.at_centers()
    return _resample_displaced_3d(
        c, -dt * vz_c / dx, -dt * vy_c / dx, -dt * vx_c / dx,
        mode, max_shift, boundary)


def advect_staggered_3d(
    v: Staggered3D,
    dt: float,
    dx: float = 1.0,
    mode: str = "shift",
    max_shift: int = 1,
    boundary: str = "clamp",
) -> Staggered3D:
    """Self-advect a 3D MAC velocity (each component at its own faces;
    transverse components center-averaged then face-resampled, the same
    scheme as the 2D advect_staggered)."""
    vz_c, vy_c, vx_c = v.at_centers()
    s = -dt / dx

    vy_at_z = centered_to_z_faces(vy_c)
    vx_at_z = centered_to_z_faces(vx_c)
    vz_new = _resample_displaced_3d(
        v.vz, s * v.vz, s * vy_at_z, s * vx_at_z, mode, max_shift, boundary)

    vz_at_y = centered_to_y_faces_3d(vz_c)
    vx_at_y = centered_to_y_faces_3d(vx_c)
    vy_new = _resample_displaced_3d(
        v.vy, s * vz_at_y, s * v.vy, s * vx_at_y, mode, max_shift, boundary)

    vz_at_x = centered_to_x_faces_3d(vz_c)
    vy_at_x = centered_to_x_faces_3d(vy_c)
    vx_new = _resample_displaced_3d(
        v.vx, s * vz_at_x, s * vy_at_x, s * v.vx, mode, max_shift, boundary)

    return Staggered3D(vz=vz_new, vy=vy_new, vx=vx_new)


def laplace_3d(f: jnp.ndarray, dx: float = 1.0) -> jnp.ndarray:
    """7-point Laplacian with Neumann (edge-replicate) boundaries."""
    out = jnp.zeros_like(f)
    for axis in (-3, -2, -1):
        fp = jnp.pad(f, [(0, 0)] * (f.ndim + axis) + [(1, 1)] +
                     [(0, 0)] * (-axis - 1), mode="edge")
        lo = [slice(None)] * f.ndim
        mid = [slice(None)] * f.ndim
        hi = [slice(None)] * f.ndim
        lo[axis] = slice(None, -2)
        mid[axis] = slice(1, -1)
        hi[axis] = slice(2, None)
        out = out + fp[tuple(lo)] - 2.0 * fp[tuple(mid)] + fp[tuple(hi)]
    return out / (dx * dx)


def divergence_free_3d(
    v: Staggered3D, domain: Domain3D, cfg: Fluid3DConfig,
    x0: jnp.ndarray | None = None,
) -> tuple[Staggered3D, jnp.ndarray]:
    """Project velocity onto its divergence-free part (Chorin projection);
    same masked operator + implicit-diff solve as 2D."""
    v = domain.mask_velocity(v)
    div = v.divergence(domain.dx)
    p = solve_pressure(div, domain, tol=cfg.pressure_tol,
                       maxiter=cfg.pressure_maxiter,
                       backend=cfg.pressure_backend, x0=x0)
    v = v - domain.pressure_gradient(p)
    return v, p


def fluid3d_step(
    state: FluidState3D,
    domain: Domain3D,
    cfg: Fluid3DConfig,
    force: Staggered3D | None = None,
    buoyancy_factor: jnp.ndarray | float | None = None,
    inflow: jnp.ndarray | None = None,
) -> FluidState3D:
    """One differentiable 3D incompressible-flow step (order matches the 2D
    fluid_step: advect → diffuse → effects → project).

    `buoyancy_factor` may be a traced (B, 1, 1, 1) or full (B, D, H, W)
    field — the indirect control channel; buoyancy acts on vz (z+ is up).
    """
    dt, dx = cfg.dt, domain.dx
    adv = dict(dx=dx, mode=cfg.advection_mode, max_shift=cfg.max_shift)
    if inflow is None:
        inflow = state.inflow

    density = advect_centered_3d(state.density, state.velocity, dt, **adv)
    if inflow is not None:
        density = density + dt * inflow
    v = advect_staggered_3d(state.velocity, dt, **adv)

    if cfg.viscosity:
        v = Staggered3D(
            vz=v.vz + dt * cfg.viscosity * laplace_3d(v.vz, dx),
            vy=v.vy + dt * cfg.viscosity * laplace_3d(v.vy, dx),
            vx=v.vx + dt * cfg.viscosity * laplace_3d(v.vx, dx),
        )

    if force is not None:
        v = v + dt * force

    buoy = cfg.buoyancy if buoyancy_factor is None else buoyancy_factor
    if buoyancy_factor is not None or cfg.buoyancy:
        if getattr(buoy, "ndim", 0) >= 4 and buoy.shape[1] == density.shape[1]:
            # Full (B, D, H, W) centered field: weight the density at
            # centers, THEN resample to z-faces (a centered field cannot
            # multiply the (B, D+1, H, W) face field directly).
            d_at_z = centered_to_z_faces(buoy * density)
            v = Staggered3D(vz=v.vz + dt * d_at_z, vy=v.vy, vx=v.vx)
        else:
            d_at_z = centered_to_z_faces(density)
            v = Staggered3D(vz=v.vz + dt * buoy * d_at_z, vy=v.vy, vx=v.vx)

    v, p = divergence_free_3d(v, domain, cfg, x0=state.pressure)
    return FluidState3D(velocity=v, density=density, inflow=state.inflow,
                        pressure=p if state.pressure is not None else None)
