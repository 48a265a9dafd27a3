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
) -> TrajectoryDataset:
    """Shape-transition style trajectories: blobs pushed by random smooth
    constant-in-time direct forces through the full solver (so endpoints
    are reachable with moderate force — BASELINE config 3's data)."""
    from pde_control_tpu.grids import centered_to_x_faces, centered_to_y_faces

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
        d0 = random_smoke_blobs(k1, b, h, w)
        fy = random_smooth_field_2d(k2, b, h, w, amplitude=force_amplitude)
        fx = random_smooth_field_2d(k3, b, h, w, amplitude=force_amplitude)
        traj = rollout(d0, fy, fx)
        chunks.append(np.moveaxis(np.asarray(traj), 0, 1)[..., None])
        remaining -= b
    obs = np.concatenate(chunks, axis=0)
    zeros_vy = np.zeros((num, h + 1, w), np.float32)
    zeros_vx = np.zeros((num, h, w + 1), np.float32)
    return TrajectoryDataset(obs, vy0=zeros_vy, vx0=zeros_vx)
