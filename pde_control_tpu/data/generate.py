"""Dataset generation — batched jitted rollouts (SURVEY.md §3.1).

Rebuild of the reference's notebook/scripts dataset generation [R]:
  * Burgers: randomized smooth initial states (superposed sinusoids [R?])
    evolved WITH randomized forcing, so endpoint reconstruction genuinely
    requires control forces (unforced trajectories would make zero force
    optimal).
  * Smoke: random Gaussian blobs rising under buoyancy (natural plumes),
    used both for OP pretraining (intermediate frames are ground truth) and
    as smoke-control targets.

All generation runs as ONE jitted `lax.scan` rollout per batch of scenes —
the TPU-native replacement for the reference's per-scene NumPy loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pde_control_tpu.data.scene import TrajectoryDataset
from pde_control_tpu.grids import Domain2D, Staggered2D
from pde_control_tpu.physics.burgers import BurgersConfig, burgers_step
from pde_control_tpu.physics.fluid import FluidConfig, FluidState, fluid_step


def random_burgers_states(
    key: jax.Array, batch: int, n: int, modes: int = 3, amplitude: float = 1.0
) -> jnp.ndarray:
    """Randomized smooth periodic fields: superposed sinusoids (B, N)."""
    k_amp, k_phase = jax.random.split(key)
    ks = jnp.arange(1, modes + 1, dtype=jnp.float32)  # wavenumbers
    amps = jax.random.normal(k_amp, (batch, modes)) * amplitude / ks[None]
    phases = jax.random.uniform(k_phase, (batch, modes), maxval=2 * jnp.pi)
    x = jnp.arange(n, dtype=jnp.float32) * (2 * jnp.pi / n)
    waves = jnp.sin(ks[None, :, None] * x[None, None, :] + phases[..., None])
    return jnp.sum(amps[..., None] * waves, axis=1)


def generate_burgers_dataset(
    cfg: BurgersConfig,
    num: int,
    n_steps: int,
    seed: int = 0,
    force_amplitude: float = 0.25,
    batch: int = 64,
) -> TrajectoryDataset:
    """Forced Burgers trajectories → TrajectoryDataset of obs (num, T, N, 1)."""

    @jax.jit
    def rollout(u0, force):
        def body(u, _):
            u2 = burgers_step(u, force, cfg)
            return u2, u2

        _, traj = lax.scan(body, u0, None, length=n_steps)
        return jnp.concatenate([u0[None], traj], axis=0)  # (T+1, B, N)

    key = jax.random.PRNGKey(seed)
    chunks = []
    remaining = num
    while remaining > 0:
        b = min(batch, remaining)
        key, k1, k2 = jax.random.split(key, 3)
        u0 = random_burgers_states(k1, b, cfg.n)
        force = random_burgers_states(k2, b, cfg.n, amplitude=force_amplitude)
        traj = rollout(u0, force)  # (T+1, b, N)
        chunks.append(np.moveaxis(np.asarray(traj), 0, 1)[..., None])
        remaining -= b
    return TrajectoryDataset(np.concatenate(chunks, axis=0))


def random_smoke_blobs(
    key: jax.Array, batch: int, h: int, w: int,
    sigma_range=(4.0, 8.0), margin: int = 8,
) -> jnp.ndarray:
    """Random Gaussian density blobs (B, H, W), peak 1."""
    k_pos, k_sig = jax.random.split(key)
    # Clamp like random_shape_densities: margin=8 on a 16-grid would pin
    # every blob to the center (zero diversity), and h<16 would invert
    # the uniform range silently.
    margin = min(margin, h // 4, w // 4)
    pos = jax.random.uniform(
        k_pos, (batch, 2),
        minval=jnp.array([margin, margin], jnp.float32),
        maxval=jnp.array([h - margin, w - margin], jnp.float32),
    )
    sig = jax.random.uniform(k_sig, (batch, 1, 1),
                             minval=sigma_range[0], maxval=sigma_range[1])
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    r2 = (yy - pos[:, 0, None, None]) ** 2 + (xx - pos[:, 1, None, None]) ** 2
    return jnp.exp(-r2 / (2 * sig**2))


def generate_smoke_dataset(
    domain: Domain2D,
    cfg: FluidConfig,
    num: int,
    n_steps: int,
    seed: int = 0,
    batch: int = 8,
) -> TrajectoryDataset:
    """Natural buoyant-plume trajectories.

    Returns TrajectoryDataset with obs (num, T+1, H, W, 1) plus the initial
    staggered velocity components vy0/vx0 (zeros — plumes start at rest).
    """
    h, w = domain.grid_shape

    @jax.jit
    def rollout(density0):
        state = FluidState(
            velocity=Staggered2D.zeros(density0.shape[0], h, w),
            density=density0,
        )

        def body(s, _):
            s2 = fluid_step(s, domain, cfg)
            return s2, s2.density

        _, dens = lax.scan(body, state, None, length=n_steps)
        return jnp.concatenate([density0[None], dens], axis=0)

    key = jax.random.PRNGKey(seed)
    chunks = []
    remaining = num
    while remaining > 0:
        b = min(batch, remaining)
        key, k = jax.random.split(key)
        d0 = random_smoke_blobs(k, b, h, w)
        traj = rollout(d0)  # (T+1, b, H, W)
        chunks.append(np.moveaxis(np.asarray(traj), 0, 1)[..., None])
        remaining -= b
    obs = np.concatenate(chunks, axis=0)
    zeros_vy = np.zeros((num, h + 1, w), np.float32)
    zeros_vx = np.zeros((num, h, w + 1), np.float32)
    return TrajectoryDataset(obs, vy0=zeros_vy, vx0=zeros_vx)


def random_shape_densities(
    key: jax.Array, batch: int, h: int, w: int,
    size_range=(5.0, 10.0), margin: int = 12, smooth: float = 1.5,
) -> jnp.ndarray:
    """Random rasterized geometric shapes (B, H, W): circles and boxes with
    a soft edge — the shape-transition task's actual content (`phi/geom/`
    [R], VERDICT r1 item 4). geom shapes accept batched (B, 1, 1) params, so
    one rasterize call draws the whole batch."""
    from pde_control_tpu.geom import Box, Sphere, rasterize

    margin = min(margin, h // 4, w // 4)
    k_pos, k_size, k_kind, k_ar = jax.random.split(key, 4)
    pos = jax.random.uniform(
        k_pos, (batch, 2, 1, 1),
        minval=float(margin), maxval=jnp.array([[h - margin], [w - margin]],
                                               jnp.float32)[None, :, :, None],
    )
    cy, cx = pos[:, 0], pos[:, 1]
    r = jax.random.uniform(k_size, (batch, 1, 1),
                           minval=size_range[0], maxval=size_range[1])
    aspect = jax.random.uniform(k_ar, (batch, 1, 1), minval=0.6, maxval=1.6)
    circles = rasterize(Sphere(cy=cy, cx=cx, r=r), h, w, smooth=smooth)
    boxes = rasterize(
        Box(y0=cy - r, x0=cx - r * aspect, y1=cy + r, x1=cx + r * aspect),
        h, w, smooth=smooth)
    is_circle = jax.random.bernoulli(k_kind, 0.5, (batch, 1, 1))
    return jnp.where(is_circle, circles, boxes)


def random_cross_densities(
    key: jax.Array, batch: int, h: int, w: int,
    size_range=(5.0, 10.0), margin: int = 12, smooth: float = 1.5,
) -> jnp.ndarray:
    """Random rasterized CROSSES (union of two elongated boxes) — a shape
    family WITHHELD from training (random_shape_densities draws circles
    and boxes only); the round-4 generalization eval's OOD targets."""
    from pde_control_tpu.geom import Box, rasterize, union

    margin = min(margin, h // 4, w // 4)
    k_pos, k_size, k_t = jax.random.split(key, 3)
    pos = jax.random.uniform(
        k_pos, (batch, 2, 1, 1),
        minval=float(margin), maxval=jnp.array([[h - margin], [w - margin]],
                                               jnp.float32)[None, :, :, None],
    )
    cy, cx = pos[:, 0], pos[:, 1]
    arm = jax.random.uniform(k_size, (batch, 1, 1),
                             minval=size_range[0], maxval=size_range[1])
    thick = arm * jax.random.uniform(k_t, (batch, 1, 1), minval=0.25,
                                     maxval=0.45)
    cross = union(
        Box(y0=cy - arm, x0=cx - thick, y1=cy + arm, x1=cx + thick),
        Box(y0=cy - thick, x0=cx - arm, y1=cy + thick, x1=cx + arm))
    return rasterize(cross, h, w, smooth=smooth)


def random_ring_densities(
    key: jax.Array, batch: int, h: int, w: int,
    size_range=(6.0, 10.0), margin: int = 12, smooth: float = 1.5,
) -> jnp.ndarray:
    """Random rasterized RINGS (annulus = outer disc minus inner disc) —
    the second withheld shape family (hollow topology: nothing like it in
    the circles+boxes training distribution)."""
    from pde_control_tpu.geom import Sphere, rasterize

    margin = min(margin, h // 4, w // 4)
    k_pos, k_size, k_in = jax.random.split(key, 3)
    pos = jax.random.uniform(
        k_pos, (batch, 2, 1, 1),
        minval=float(margin), maxval=jnp.array([[h - margin], [w - margin]],
                                               jnp.float32)[None, :, :, None],
    )
    cy, cx = pos[:, 0], pos[:, 1]
    r_out = jax.random.uniform(k_size, (batch, 1, 1),
                               minval=size_range[0], maxval=size_range[1])
    r_in = r_out * jax.random.uniform(k_in, (batch, 1, 1), minval=0.4,
                                      maxval=0.65)
    outer = rasterize(Sphere(cy=cy, cx=cx, r=r_out), h, w, smooth=smooth)
    inner = rasterize(Sphere(cy=cy, cx=cx, r=r_in), h, w, smooth=smooth)
    return jnp.clip(outer - inner, 0.0, 1.0)


def random_inflow(
    key: jax.Array, batch: int, h: int, w: int,
    rate: float = 0.08, sigma: float = 2.0, y0: float = 4.0,
    x_range: tuple = (0.15, 0.85),
) -> jnp.ndarray:
    """Continuous smoke sources (B, H, W): a Gaussian emitter of strength
    `rate` near the bottom wall at random x (reference: Inflow FieldEffect
    at the smoke task's source [R])."""
    xs = jax.random.uniform(key, (batch, 1, 1), minval=x_range[0] * w,
                            maxval=x_range[1] * w)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    r2 = (yy - y0) ** 2 + (xx - xs) ** 2
    return rate * jnp.exp(-r2 / (2 * sigma**2))


def generate_inflow_smoke_dataset(
    domain: Domain2D,
    cfg: FluidConfig,
    num: int,
    n_steps: int,
    seed: int = 0,
    control_amplitude: float = 0.6,
    batch: int = 8,
    warmup: int = 8,
    inflow_kwargs: dict | None = None,
) -> TrajectoryDataset:
    """The reference's actual smoke benchmark data (VERDICT r1 items 2-3):
    an inflow-driven plume rising through obstacles, steered by a WITHHELD
    random buoyancy-modulation field b(x) applied exactly as the buoyancy-
    mode CFE applies control (vy += dt·b·ρ on y-faces). The target frame is
    therefore NOT the natural evolution — zero force cannot reproduce it —
    while staying reachable by the controller's force parameterization.

    `warmup` natural (unforced) steps run before frame 0 so the recorded
    window starts with a developed plume — indirect forcing is ∝ density,
    so it has no authority over an empty domain."""
    from pde_control_tpu.grids import centered_to_y_faces

    h, w = domain.grid_shape

    @jax.jit
    def rollout(inflow, b_field):
        state = FluidState(
            velocity=Staggered2D.zeros(inflow.shape[0], h, w),
            density=jnp.zeros_like(inflow),
            inflow=inflow,
        )

        def natural(s, _):
            return fluid_step(s, domain, cfg), None

        if warmup:
            state, _ = lax.scan(natural, state, None, length=warmup)

        def body(s, _):
            force = Staggered2D(
                vy=centered_to_y_faces(b_field * s.density),
                vx=jnp.zeros_like(s.velocity.vx),
            )
            s2 = fluid_step(s, domain, cfg, force=force)
            return s2, s2.density

        _, dens = lax.scan(body, state, None, length=n_steps)
        # frame 0 = the post-warmup state; its velocity must ship with the
        # data or the controller would start from the wrong initial state.
        return (jnp.concatenate([state.density[None], dens], axis=0),
                state.velocity)

    key = jax.random.PRNGKey(seed)
    chunks, inflows, vy0s, vx0s = [], [], [], []
    remaining = num
    while remaining > 0:
        b = min(batch, remaining)
        key, k1, k2 = jax.random.split(key, 3)
        inflow = random_inflow(k1, b, h, w, **(inflow_kwargs or {}))
        b_field = random_smooth_field_2d(k2, b, h, w,
                                         amplitude=control_amplitude)
        traj, vel0 = rollout(inflow, b_field)  # (T+1, b, H, W)
        chunks.append(np.moveaxis(np.asarray(traj), 0, 1)[..., None])
        inflows.append(np.asarray(inflow))
        vy0s.append(np.asarray(vel0.vy))
        vx0s.append(np.asarray(vel0.vx))
        remaining -= b
    obs = np.concatenate(chunks, axis=0)
    return TrajectoryDataset(obs,
                             vy0=np.concatenate(vy0s, axis=0),
                             vx0=np.concatenate(vx0s, axis=0),
                             inflow=np.concatenate(inflows, axis=0))


def random_smooth_field_2d(
    key: jax.Array, batch: int, h: int, w: int, modes: int = 3,
    amplitude: float = 1.0,
) -> jnp.ndarray:
    """Random smooth (B, H, W) fields from low-frequency Fourier modes."""
    k_amp, k_phy, k_phx = jax.random.split(key, 3)
    ky = jnp.arange(1, modes + 1, dtype=jnp.float32)
    amps = jax.random.normal(k_amp, (batch, modes, modes)) * amplitude
    phy = jax.random.uniform(k_phy, (batch, modes, 1), maxval=2 * jnp.pi)
    phx = jax.random.uniform(k_phx, (batch, modes, 1), maxval=2 * jnp.pi)
    y = jnp.arange(h, dtype=jnp.float32) * (jnp.pi / h)
    x = jnp.arange(w, dtype=jnp.float32) * (jnp.pi / w)
    sy = jnp.sin(ky[None, :, None] * y[None, None, :] + phy)  # (B, M, H)
    sx = jnp.sin(ky[None, :, None] * x[None, None, :] + phx)  # (B, M, W)
    return jnp.einsum("bmy,bnx,bmn->byx", sy, sx, amps) / modes


def generate_forced_smoke_dataset(
    domain: Domain2D,
    cfg: FluidConfig,
    num: int,
    n_steps: int,
    seed: int = 0,
    force_amplitude: float = 0.1,
    batch: int = 8,
    init: str = "shapes",  # 'shapes' (geom-rasterized, config 3) | 'blobs'
) -> TrajectoryDataset:
    """Shape-transition style trajectories: rasterized geometric shapes (or
    Gaussian blobs) pushed by random smooth constant-in-time direct forces
    through the full solver. The forcing is WITHHELD from the controller, so
    endpoint reconstruction genuinely requires control (the same
    de-degeneracy device as the Burgers data) while staying reachable with
    moderate force — BASELINE config 3/5 data."""
    from pde_control_tpu.grids import centered_to_x_faces, centered_to_y_faces

    # 'crosses' / 'rings' are WITHHELD from every training run (which uses
    # 'shapes' = circles+boxes) — they exist for OOD generalization evals.
    init_fn = {"shapes": random_shape_densities,
               "blobs": random_smoke_blobs,
               "crosses": random_cross_densities,
               "rings": random_ring_densities}[init]
    h, w = domain.grid_shape

    @jax.jit
    def rollout(density0, fy_c, fx_c):
        force = Staggered2D(vy=centered_to_y_faces(fy_c),
                            vx=centered_to_x_faces(fx_c))
        state = FluidState(
            velocity=Staggered2D.zeros(density0.shape[0], h, w),
            density=density0,
        )

        def body(s, _):
            s2 = fluid_step(s, domain, cfg, force=force)
            return s2, s2.density

        _, dens = lax.scan(body, state, None, length=n_steps)
        return jnp.concatenate([density0[None], dens], axis=0)

    key = jax.random.PRNGKey(seed)
    chunks = []
    remaining = num
    while remaining > 0:
        b = min(batch, remaining)
        key, k1, k2, k3 = jax.random.split(key, 4)
        d0 = init_fn(k1, b, h, w)
        fy = random_smooth_field_2d(k2, b, h, w, amplitude=force_amplitude)
        fx = random_smooth_field_2d(k3, b, h, w, amplitude=force_amplitude)
        traj = rollout(d0, fy, fx)
        chunks.append(np.moveaxis(np.asarray(traj), 0, 1)[..., None])
        remaining -= b
    obs = np.concatenate(chunks, axis=0)
    zeros_vy = np.zeros((num, h + 1, w), np.float32)
    zeros_vx = np.zeros((num, h, w + 1), np.float32)
    return TrajectoryDataset(obs, vy0=zeros_vy, vx0=zeros_vx)
