"""2D incompressible Navier-Stokes step (smoke / shape-transition physics).

Replaces `phi/physics/fluid.py :: Fluid / IncompressibleFlow.step` [R]
(SURVEY.md §2b, §3.1): semi-Lagrangian advection of marker and velocity →
explicit diffusion → additive forces / buoyancy → pressure projection.

Order of operations matches the reference [R]: advect(density, velocity) →
advect(velocity) → diffuse → effects (forces, buoyancy) → divergence_free.
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp

from pde_control_tpu.grids import Domain2D, Staggered2D, centered_to_y_faces
from pde_control_tpu.ops.stencils import laplace
from pde_control_tpu.physics.advect import advect_centered, advect_staggered
from pde_control_tpu.physics.poisson import solve_pressure


@flax.struct.dataclass
class FluidState:
    """velocity: MAC grid; density: (B, H, W) passive marker (smoke);
    inflow: optional (B, H, W) per-sample continuous smoke source rate —
    PhiFlow's Inflow FieldEffect [R] carried as state so it rides the scan
    (constant across steps; dt·inflow is added to density each step);
    pressure: optional (B, H, W) previous step's pressure, carried to
    warm-start the next projection's CG (FluidConfig.warm_start_pressure —
    consecutive rollout pressures are close, so x0=prev p cuts iteration
    counts; stop_gradient'd at use, so AD is unaffected)."""

    velocity: Staggered2D
    density: jnp.ndarray
    inflow: jnp.ndarray | None = None
    pressure: jnp.ndarray | None = None

    @classmethod
    def zeros(cls, batch: int, h: int, w: int, dtype=jnp.float32,
              with_inflow: bool = False) -> "FluidState":
        return cls(
            velocity=Staggered2D.zeros(batch, h, w, dtype),
            density=jnp.zeros((batch, h, w), dtype),
            inflow=jnp.zeros((batch, h, w), dtype) if with_inflow else None,
        )


@dataclasses.dataclass(frozen=True)
class FluidConfig:
    """Static solver parameters for the NS step (trace-time constants)."""

    dt: float = 1.0
    viscosity: float = 0.0
    buoyancy: float = 0.1          # upward force per unit density (y+ is up)
    advection_mode: str = "shift"  # 'shift' (TPU-fast) | 'gather'
    max_shift: int = 2             # CFL bound for shift advection
    pressure_tol: float = 1e-5
    pressure_maxiter: int = 500
    # 'auto' | 'jax' (masked CG) | 'pallas' (fused-kernel PCG) |
    # 'spectral' (exact DCT solve, obstacle-free domains only) |
    # 'pcg' (spectrally-preconditioned CG) — see poisson.solve_pressure.
    pressure_backend: str = "auto"
    # Seed rollouts with a zero pressure field (PDE.initial_state) so each
    # step's CG warm-starts from the previous step's solution. Same solution
    # to `pressure_tol`, fewer iterations; no effect on exact spectral path.
    warm_start_pressure: bool = False
    # Whole-step fusion (ops/pallas_fluid.py): run the ENTIRE step —
    # advection, forces, buoyancy, masking, PCG projection, correction — as
    # one Pallas kernel with a hand-written VJP. 'pallas' forces it when
    # supported (2D, closed, shift advection, no viscosity, static buoyancy,
    # fits VMEM; interpret mode off-TPU — tests); 'off' disables; 'auto'
    # currently resolves to the UNFUSED path: measured on v5e at 64² n=16
    # batch 8 the monolithic kernel is 0.75-0.83× the XLA composition
    # (16-step rollout fwd+bwd 8.12 vs 6.12 ms) — the step is bounded by
    # solver + VPU compute, not kernel count, so fusing buys nothing and the
    # in-kernel advection codegen loses to XLA's (RESULTS.md round-3 note).
    fused: str = "auto"


def _fused_applicable(state: "FluidState", domain: Domain2D,
                      cfg: "FluidConfig", buoyancy_factor) -> bool:
    """Trace-time gate for the whole-step Pallas kernel (see
    FluidConfig.fused). The fused path is mathematically interchangeable
    with the XLA path (tests/test_pallas_fluid.py pins fwd + VJP equality,
    including subgradient tie points); this gate only restricts it to the
    configurations the kernel implements."""
    if cfg.fused == "off":
        return False
    from pde_control_tpu.ops.pallas_fluid import fused_step_fits

    supported = (
        buoyancy_factor is None
        and cfg.advection_mode == "shift"
        and not cfg.viscosity
        and domain.closed
        and state.density.ndim == 3
        and fused_step_fits(*domain.grid_shape)
    )
    if cfg.fused == "pallas":
        if not supported:
            raise ValueError(
                "FluidConfig.fused='pallas' but this configuration is not "
                "supported by the fused kernel (needs 2D closed domain, "
                "shift advection, viscosity=0, static buoyancy, grid "
                "within the VMEM budget)")
        if not domain.has_obstacles and cfg.pressure_backend in (
                "auto", "spectral"):
            # (Obstacle domains never use the exact solve; an explicit
            # 'spectral' there fails in _pick_backend with the right
            # message — don't mask it with this one.)
            # The unfused path would use the EXACT spectral solve here;
            # the fused kernel always runs tol-bounded PCG. Refuse rather
            # than silently degrade pressure accuracy by up to tol.
            raise ValueError(
                "FluidConfig.fused='pallas' conflicts with the exact "
                "spectral pressure solve this domain would use "
                "(closed, no obstacles). Set pressure_backend='pcg' "
                "explicitly to accept tol-bounded pressure, or "
                "fused='off'/'auto'.")
        return True
    # 'auto': measured slower than the XLA composition on v5e (see
    # FluidConfig.fused docstring) — route to the unfused path.
    return False


def divergence_free(
    v: Staggered2D, domain: Domain2D, cfg: FluidConfig,
    x0: jnp.ndarray | None = None,
) -> tuple[Staggered2D, jnp.ndarray]:
    """Project velocity onto its divergence-free part (Chorin projection).

    Replaces `phi.physics.fluid.divergence_free` [R]. Returns (v', p) with
    div v' ≈ 0 on fluid cells and v'·n = 0 on blocked faces. `x0` optionally
    warm-starts the iterative pressure solve (previous step's p).
    """
    v = domain.mask_velocity(v)
    div = v.divergence(domain.dx)
    p = solve_pressure(div, domain, tol=cfg.pressure_tol,
                       maxiter=cfg.pressure_maxiter,
                       backend=cfg.pressure_backend, x0=x0)
    v = v - domain.pressure_gradient(p)
    return v, p


def fluid_step(
    state: FluidState,
    domain: Domain2D,
    cfg: FluidConfig,
    force: Staggered2D | None = None,
    buoyancy_factor: jnp.ndarray | float | None = None,
    inflow: jnp.ndarray | None = None,
) -> FluidState:
    """One differentiable incompressible-flow step.

    Args:
      state: current (velocity, density).
      domain: geometry (walls, obstacles).
      cfg: solver parameters.
      force: optional staggered control force, applied as +dt·F (direct
        velocity forcing — shape-transition task).
      buoyancy_factor: overrides cfg.buoyancy when given; may be a traced
        per-batch scalar (B, 1, 1) — the *indirect* control channel of the
        smoke task (buoyancy-only forcing [R], BASELINE config 4).
      inflow: optional (B, H, W) or (H, W) smoke source rate — PhiFlow's
        Inflow FieldEffect [R]; density += dt·inflow after advection.
        Defaults to state.inflow when the state carries one.
    Returns: next FluidState (projected velocity, advected density).
    """
    dt, dx = cfg.dt, domain.dx
    adv = dict(dx=dx, mode=cfg.advection_mode, max_shift=cfg.max_shift)
    if inflow is None:
        inflow = state.inflow

    if _fused_applicable(state, domain, cfg, buoyancy_factor):
        from pde_control_tpu.ops.pallas_fluid import fused_fluid_step

        if inflow is not None and inflow.ndim == 2:
            # The kernel's BlockSpecs want a batched (B, H, W) operand;
            # the XLA path broadcasts (H, W) implicitly.
            inflow = jnp.broadcast_to(inflow[None],
                                      state.density.shape)
        vy, vx, rho, p = fused_fluid_step(
            state.velocity.vy, state.velocity.vx, state.density,
            domain.acc_y, domain.acc_x, domain.fluid_mask,
            fy=None if force is None else force.vy,
            fx=None if force is None else force.vx,
            inflow=inflow, x0=state.pressure,
            dt=dt, dx=dx, max_shift=cfg.max_shift, buoyancy=cfg.buoyancy,
            closed=domain.closed, tol=cfg.pressure_tol,
            maxiter=cfg.pressure_maxiter,
            interpret=jax.default_backend() != "tpu")
        return FluidState(
            velocity=Staggered2D(vy=vy, vx=vx), density=rho,
            inflow=state.inflow,
            pressure=p if state.pressure is not None else None)

    density = advect_centered(state.density, state.velocity, dt, **adv)
    if inflow is not None:
        density = density + dt * inflow
    v = advect_staggered(state.velocity, dt, **adv)

    if cfg.viscosity:
        v = Staggered2D(
            vy=v.vy + dt * cfg.viscosity * laplace(v.vy, dx, "neumann"),
            vx=v.vx + dt * cfg.viscosity * laplace(v.vx, dx, "neumann"),
        )

    if force is not None:
        v = v + dt * force

    buoy = cfg.buoyancy if buoyancy_factor is None else buoyancy_factor
    if buoyancy_factor is not None or cfg.buoyancy:
        d_at_y = centered_to_y_faces(density)
        v = Staggered2D(vy=v.vy + dt * buoy * d_at_y, vx=v.vx)

    v, p = divergence_free(v, domain, cfg, x0=state.pressure)
    return FluidState(velocity=v, density=density, inflow=state.inflow,
                      pressure=p if state.pressure is not None else None)
