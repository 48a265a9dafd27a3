"""3D smoke control experiment — beyond-reference capability demo.

Buoyant blobs in a closed volume pushed by WITHHELD random constant-in-time
forcing (the same de-degeneracy device as the 2D configs: zero force cannot
reproduce the target), controlled by the dim=3 CFE/OP stack through the
full staged curriculum. Default scale 24³, n=8 — sized so a single-chip
run finishes in minutes; the physics/pressure paths are the same
ndim-dispatched code the 2D benchmarks use.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from pde_control_tpu.control.pde_fluid3d import IncompressibleFluid3DPDE
from pde_control_tpu.data.scene import TrajectoryDataset
from pde_control_tpu.experiments.curriculum import (
    CurriculumConfig,
    finetune_e2e,
    run_curriculum,
)
from pde_control_tpu.grids3d import Domain3D, Staggered3D
from pde_control_tpu.physics.fluid3d import (
    Fluid3DConfig,
    FluidState3D,
    fluid3d_step,
)


def random_blobs_3d(key, batch: int, d: int, h: int, w: int,
                    sigma_range=(2.0, 4.0), margin: int = 4) -> jnp.ndarray:
    """Random Gaussian density blobs (B, D, H, W), peak 1."""
    k_pos, k_sig = jax.random.split(key)
    # Clamp the margin so lo < hi even on tiny (smoke-test) volumes —
    # margin=4 on an 8-cube would pin every blob at the center.
    m = min(margin, max(1, min(d, h, w) // 3))
    lo = jnp.array([m] * 3, jnp.float32)
    hi = jnp.array([d - m, h - m, w - m], jnp.float32)
    pos = jax.random.uniform(k_pos, (batch, 3), minval=lo, maxval=hi)
    sig = jax.random.uniform(k_sig, (batch, 1, 1, 1),
                             minval=sigma_range[0], maxval=sigma_range[1])
    zz = jnp.arange(d, dtype=jnp.float32)[None, :, None, None]
    yy = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    r2 = ((zz - pos[:, 0, None, None, None]) ** 2
          + (yy - pos[:, 1, None, None, None]) ** 2
          + (xx - pos[:, 2, None, None, None]) ** 2)
    return jnp.exp(-r2 / (2 * sig**2))


def random_smooth_field_3d(key, batch: int, d: int, h: int, w: int,
                           modes: int = 2,
                           amplitude: float = 1.0) -> jnp.ndarray:
    """Random smooth (B, D, H, W) fields from low-frequency modes."""
    k_amp, k_pz, k_py, k_px = jax.random.split(key, 4)
    m = jnp.arange(1, modes + 1, dtype=jnp.float32)
    amps = jax.random.normal(k_amp, (batch, modes, modes, modes)) * amplitude
    ph = [jax.random.uniform(k, (batch, modes, 1), maxval=2 * jnp.pi)
          for k in (k_pz, k_py, k_px)]
    axes = [jnp.arange(n, dtype=jnp.float32) * (jnp.pi / n)
            for n in (d, h, w)]
    sz = jnp.sin(m[None, :, None] * axes[0][None, None, :] + ph[0])
    sy = jnp.sin(m[None, :, None] * axes[1][None, None, :] + ph[1])
    sx = jnp.sin(m[None, :, None] * axes[2][None, None, :] + ph[2])
    return jnp.einsum("bmz,bny,box,bmno->bzyx", sz, sy, sx,
                      amps) / (modes ** 1.5)


def generate_forced_smoke3d_dataset(
    domain: Domain3D,
    cfg: Fluid3DConfig,
    num: int,
    n_steps: int,
    seed: int = 0,
    force_amplitude: float = 0.15,
    batch: int = 4,
) -> TrajectoryDataset:
    """Blobs pushed by withheld random constant-in-time 3D forces (the
    controller must reconstruct their effect — non-degenerate by design)."""
    from pde_control_tpu.grids3d import (
        centered_to_x_faces_3d,
        centered_to_y_faces_3d,
        centered_to_z_faces,
    )

    d, h, w = domain.grid_shape

    @jax.jit
    def rollout(density0, fz_c, fy_c, fx_c):
        force = Staggered3D(vz=centered_to_z_faces(fz_c),
                            vy=centered_to_y_faces_3d(fy_c),
                            vx=centered_to_x_faces_3d(fx_c))
        state = FluidState3D(
            velocity=Staggered3D.zeros(density0.shape[0], d, h, w),
            density=density0)

        def body(s, _):
            s2 = fluid3d_step(s, domain, cfg, force=force)
            return s2, s2.density

        _, dens = lax.scan(body, state, None, length=n_steps)
        return jnp.concatenate([density0[None], dens], axis=0)

    key = jax.random.PRNGKey(seed)
    chunks = []
    remaining = num
    while remaining > 0:
        b = min(batch, remaining)
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        d0 = random_blobs_3d(k1, b, d, h, w)
        fz = random_smooth_field_3d(k2, b, d, h, w,
                                    amplitude=force_amplitude)
        fy = random_smooth_field_3d(k3, b, d, h, w,
                                    amplitude=force_amplitude)
        fx = random_smooth_field_3d(k4, b, d, h, w,
                                    amplitude=force_amplitude)
        traj = rollout(d0, fz, fy, fx)
        chunks.append(np.moveaxis(np.asarray(traj), 0, 1)[..., None])
        remaining -= b
    return TrajectoryDataset(np.concatenate(chunks, axis=0))


def obstacle_plate_3d(d: int, h: int, w: int) -> np.ndarray:
    """3D obstacle course: a horizontal plate at mid-height with a square
    hole offset from the center — the rising plume must route through the
    hole (the volumetric analog of the 2D smoke task's staggered plates)."""
    mask = np.zeros((d, h, w), np.float32)
    z0 = int(d * 0.5)
    mask[z0:z0 + 2, :, :] = 1.0
    hy, hx = int(h * 0.30), int(w * 0.55)
    hole = max(3, h // 5)
    mask[z0:z0 + 2, hy:hy + hole, hx:hx + hole] = 0.0
    return mask


def random_inflow_3d(key, batch: int, d: int, h: int, w: int,
                     rate: float = 0.08, sigma: float = 2.0,
                     z0: float = 3.0) -> jnp.ndarray:
    """Continuous smoke sources (B, D, H, W): a Gaussian emitter near the
    bottom wall at random (y, x) — the 3D Inflow FieldEffect analog."""
    pos = jax.random.uniform(
        key, (batch, 2, 1, 1, 1),
        minval=jnp.array([0.2 * h, 0.2 * w],
                         jnp.float32)[None, :, None, None, None],
        maxval=jnp.array([0.8 * h, 0.8 * w],
                         jnp.float32)[None, :, None, None, None])
    zz = jnp.arange(d, dtype=jnp.float32)[None, :, None, None]
    yy = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    r2 = ((zz - z0) ** 2 + (yy - pos[:, 0]) ** 2 + (xx - pos[:, 1]) ** 2)
    return rate * jnp.exp(-r2 / (2 * sigma ** 2))


def generate_inflow_smoke3d_dataset(
    domain: Domain3D,
    cfg: Fluid3DConfig,
    num: int,
    n_steps: int,
    seed: int = 0,
    control_amplitude: float = 0.3,
    batch: int = 4,
    warmup: int = 6,
) -> TrajectoryDataset:
    """3D analog of the 2D inflow smoke data (data/generate.py
    :: generate_inflow_smoke_dataset): an inflow-driven plume rising through
    the obstacle plate, steered by a WITHHELD random buoyancy-modulation
    field b(x) applied exactly as the buoyancy-mode CFE applies control
    (vz += dt·b·ρ on z-faces). Non-degenerate by construction; `warmup`
    unforced steps develop the plume before frame 0 (indirect forcing has
    no authority over an empty domain)."""
    from pde_control_tpu.grids3d import centered_to_z_faces

    d, h, w = domain.grid_shape

    @jax.jit
    def rollout(inflow, b_field):
        state = FluidState3D(
            velocity=Staggered3D.zeros(inflow.shape[0], d, h, w),
            density=jnp.zeros_like(inflow),
            inflow=inflow)

        def natural(s, _):
            return fluid3d_step(s, domain, cfg), None

        if warmup:
            state, _ = lax.scan(natural, state, None, length=warmup)

        def body(s, _):
            force = Staggered3D(
                vz=centered_to_z_faces(b_field * s.density),
                vy=jnp.zeros_like(s.velocity.vy),
                vx=jnp.zeros_like(s.velocity.vx))
            s2 = fluid3d_step(s, domain, cfg, force=force)
            return s2, s2.density

        _, dens = lax.scan(body, state, None, length=n_steps)
        return (jnp.concatenate([state.density[None], dens], axis=0),
                state.velocity)

    key = jax.random.PRNGKey(seed)
    chunks, inflows, v0 = [], [], {"vz0": [], "vy0": [], "vx0": []}
    remaining = num
    while remaining > 0:
        b = min(batch, remaining)
        key, k1, k2 = jax.random.split(key, 3)
        inflow = random_inflow_3d(k1, b, d, h, w)
        b_field = random_smooth_field_3d(k2, b, d, h, w,
                                         amplitude=control_amplitude)
        traj, vel0 = rollout(inflow, b_field)
        chunks.append(np.moveaxis(np.asarray(traj), 0, 1)[..., None])
        inflows.append(np.asarray(inflow))
        v0["vz0"].append(np.asarray(vel0.vz))
        v0["vy0"].append(np.asarray(vel0.vy))
        v0["vx0"].append(np.asarray(vel0.vx))
        remaining -= b
    return TrajectoryDataset(
        np.concatenate(chunks, axis=0),
        inflow=np.concatenate(inflows, axis=0),
        **{k: np.concatenate(vs, axis=0) for k, vs in v0.items()})


def _smoke3d_indirect_setup(size: int, n: int, num_train: int,
                            num_val: int):
    """The 3D indirect task's (pde, train, val) — shared by the main
    curriculum and the fine-tune entry so both train on the SAME task
    and datasets (same generation seeds)."""
    obstacles = obstacle_plate_3d(size, size, size)
    domain = Domain3D.create(size, size, size,
                             obstacle_mask=jnp.asarray(obstacles))
    cfg = Fluid3DConfig(dt=0.7, buoyancy=0.05, pressure_tol=1e-4,
                        pressure_maxiter=200, warm_start_pressure=True)
    train = generate_inflow_smoke3d_dataset(domain, cfg, num_train, n,
                                            seed=0)
    val = generate_inflow_smoke3d_dataset(domain, cfg, num_val, n, seed=999)
    pde = IncompressibleFluid3DPDE(domain, cfg, control="buoyancy",
                                   with_inflow=True, unet_levels=2)
    return pde, train, val


def run_smoke3d_indirect(workdir: str, size: int = 32, n: int = 16,
                         iterations: int = 400, num_train: int = 128,
                         num_val: int = 16, batch_size: int = 8,
                         e2e_iterations: int | None = None,
                         mesh=None, seed: int = 0, resume: bool = False) -> dict:
    """3D indirect smoke control (VERDICT r2 item 5): buoyancy-only CFE
    steering an inflow-driven plume through an obstacle plate at size³,
    n=16 — the full 2D flagship task lifted to volumes."""
    pde, train, val = _smoke3d_indirect_setup(size, n, num_train, num_val)
    # force_reg: 3e-5 is the converged value. The round-2 resize rule
    # (reg term was 58% of the converged loss) suggested 1e-5, but that
    # resize DIVERGED twice (honest negative result, r4a/r4b queue logs):
    # the supervised CFE stage hit non-finite gradients at step ~400, and
    # an e2e stage resumed from the last-finite checkpoint overflowed the
    # fp32 force cost on step 1 while the CFL-clipped rollout stayed
    # finite. On this task the reg term is load-bearing for stability,
    # not just a quality knob — keep 3e-5.
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            cfe_iterations=iterations,
                            op_iterations=iterations,
                            e2e_iterations=e2e_iterations or iterations,
                            e2e_lr=1e-4, grad_clip=1.0,
                            force_reg=3e-5, seed=seed)
    return run_curriculum(pde, ccfg, train, val, workdir, mesh=mesh,
                          resume=resume)


def run_smoke3d_indirect_ft(workdir: str, init_from: str,
                            force_reg: float = 1.5e-5,
                            size: int = 32, n: int = 16,
                            num_train: int = 128, num_val: int = 16,
                            batch_size: int = 8,
                            e2e_iterations: int | None = None,
                            mesh=None, seed: int = 0,
                            resume: bool = False) -> dict:
    """Force-reg annealing fine-tune of a converged smoke3d_indirect run.

    At the converged force_reg=3e-5 the reg term is ~half the loss
    (round-2 invariant: the reg share re-grows as control improves and
    caps observation quality), but training FROM SCRATCH below 3e-5
    diverges (see run_smoke3d_indirect). This entry anneals instead:
    restore all nets from `init_from` (a finished run's ckpt_final) and
    run one more e2e stage at a lower reg — the controller starts
    converged and stable, so the divergence window at low reg is never
    entered. Same task, same datasets (seeds fixed in the shared setup)."""
    pde, train, val = _smoke3d_indirect_setup(size, n, num_train, num_val)
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            e2e_iterations=e2e_iterations or 600,
                            e2e_lr=5e-5, grad_clip=1.0,
                            force_reg=force_reg, seed=seed)
    return finetune_e2e(pde, ccfg, train, val, workdir, init_from,
                        mesh=mesh, resume=resume)


def run_smoke3d_ft(workdir: str, init_from: str,
                   force_reg: float = 5e-6,
                   size: int = 24, n: int = 8,
                   num_train: int = 64, num_val: int = 16,
                   batch_size: int = 4,
                   e2e_iterations: int | None = None,
                   mesh=None, seed: int = 0,
                   resume: bool = False) -> dict:
    """Force-reg annealing fine-tune of a converged smoke3d (direct) run.

    Same mechanism as run_smoke3d_indirect_ft: the converged e2e loss at
    force_reg=1e-5 splits 60% obs / 40% reg (runs/smoke3d/results.json),
    so the reg share caps the controlled MSE. Restore all nets from a
    finished run's ckpt_final and run one more e2e stage at a lower reg —
    annealing from the converged controller sidesteps the from-scratch
    low-reg divergence. Datasets are regenerated with the same fixed
    seeds (0 train / 999 val) and config as run_smoke3d."""
    domain = Domain3D.create(size, size, size)
    cfg = Fluid3DConfig(dt=0.7, buoyancy=0.05, pressure_tol=1e-4,
                        pressure_maxiter=200, warm_start_pressure=True)
    train = generate_forced_smoke3d_dataset(domain, cfg, num_train, n,
                                            seed=0)
    val = generate_forced_smoke3d_dataset(domain, cfg, num_val, n, seed=999)
    pde = IncompressibleFluid3DPDE(domain, cfg, control="direct",
                                   unet_levels=2)
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            e2e_iterations=e2e_iterations or 600,
                            e2e_lr=5e-5, grad_clip=1.0,
                            force_reg=force_reg, seed=seed)
    return finetune_e2e(pde, ccfg, train, val, workdir, init_from,
                        mesh=mesh, resume=resume)


def run_smoke3d(workdir: str, size: int = 24, n: int = 8,
                iterations: int = 300, num_train: int = 64,
                num_val: int = 16, batch_size: int = 4,
                e2e_iterations: int | None = None,
                mesh=None, seed: int = 0, resume: bool = False) -> dict:
    """3D smoke control: direct forcing on a size³ volume."""
    domain = Domain3D.create(size, size, size)
    cfg = Fluid3DConfig(dt=0.7, buoyancy=0.05, pressure_tol=1e-4,
                        pressure_maxiter=200, warm_start_pressure=True)
    # force_amplitude 0.15: 0.08 left the task near-degenerate (zero-force
    # MSE 8.5e-5) and 0.35 pushed accumulated velocities past the
    # max_shift=1 CFL clip (displacement ≈ 0.35·0.7·8 ≈ 2 cells), which
    # saturates the clipped advection and flattens gradients (the r1
    # training-stability finding). 0.15 keeps displacement ≲ 0.85 cells
    # while the zero-force MSE stays well above the controller's floor.
    train = generate_forced_smoke3d_dataset(domain, cfg, num_train, n,
                                            seed=0)
    val = generate_forced_smoke3d_dataset(domain, cfg, num_val, n, seed=999)
    pde = IncompressibleFluid3DPDE(domain, cfg, control="direct",
                                   unet_levels=2)
    # grad_clip: every unclipped solver-in-the-loop e2e stage this round
    # eventually diverged (force costs blew up to 1e12-1e24).
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            cfe_iterations=iterations,
                            op_iterations=iterations,
                            e2e_iterations=e2e_iterations or iterations,
                            e2e_lr=1e-4, grad_clip=1.0,
                            force_reg=1e-5, seed=seed)
    return run_curriculum(pde, ccfg, train, val, workdir, mesh=mesh,
                          resume=resume)
