"""The control stack on 3D volumes: staged training + inference machinery
with the dim=3 nets and the 3D fluid plugin (tiny 8³ problem)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from pde_control_tpu.control.pde_fluid3d import IncompressibleFluid3DPDE
from pde_control_tpu.control.training import ControlTraining
from pde_control_tpu.data.scene import TrajectoryDataset
from pde_control_tpu.grids3d import Domain3D, Staggered3D
from pde_control_tpu.physics.fluid3d import (
    Fluid3DConfig,
    FluidState3D,
    fluid3d_step,
)

S = 8  # 8³ grid
N = 2


def _dataset(num=8, seed=0):
    """Buoyant blobs under withheld constant forcing (non-degenerate)."""
    rng = np.random.default_rng(seed)
    domain = Domain3D.create(S, S, S)
    cfg = Fluid3DConfig(dt=0.5, buoyancy=0.05, pressure_tol=1e-5,
                        pressure_maxiter=200)
    z, y, x = np.meshgrid(*([np.arange(S)] * 3), indexing="ij")

    @jax.jit
    def rollout(d0, fz):
        force = Staggered3D(
            vz=fz, vy=jnp.zeros((num, S, S + 1, S), jnp.float32),
            vx=jnp.zeros((num, S, S, S + 1), jnp.float32))
        state = FluidState3D(velocity=Staggered3D.zeros(num, S, S, S),
                             density=d0)

        def body(s, _):
            s2 = fluid3d_step(s, domain, cfg, force=force)
            return s2, s2.density

        _, dens = lax.scan(body, state, None, length=N)
        return jnp.concatenate([d0[None], dens], axis=0)

    c = rng.uniform(2, 6, (num, 3))
    d0 = np.exp(-((z[None] - c[:, 0, None, None, None]) ** 2
                  + (y[None] - c[:, 1, None, None, None]) ** 2
                  + (x[None] - c[:, 2, None, None, None]) ** 2) / 3.0
                ).astype(np.float32)
    fz = rng.uniform(-0.1, 0.1, (num, S + 1, S, S)).astype(np.float32)
    obs = np.moveaxis(np.asarray(rollout(jnp.asarray(d0), jnp.asarray(fz))),
                      0, 1)[..., None]
    return TrajectoryDataset(obs), domain, cfg


def test_training_and_inference_3d():
    data, domain, cfg = _dataset()
    pde = IncompressibleFluid3DPDE(domain, cfg, control="direct",
                                   unet_levels=2)
    app = ControlTraining(
        N, pde, dataset=data, batch_size=4,
        trainable_networks=("CFE", "OP2"),
        sequence_class="staggered", obs_loss_frames=(N,),
        force_reg=1e-4,
    ).prepare()
    first = app.train(2, log_every=1)
    last = app.train(8, log_every=4)
    assert np.isfinite(last["loss"])
    assert last["loss"] < 10 * first["loss"] + 1.0  # sane, not exploding

    batch = data.sample(np.random.default_rng(0), 4)
    obs_traj, costs, final, forces = app.infer_all_frames(
        batch, keep_forces=True)
    assert np.asarray(obs_traj).shape == (N, 4, S, S, S, 1)
    assert np.isfinite(np.asarray(obs_traj)).all()
    assert np.asarray(forces.vz).shape[0] == N  # per-step force fields
    # mean |F| metric works on the 3D force pytree
    m = pde.force_abs_mean(jax.tree_util.tree_map(lambda a: a[0], forces))
    assert np.isfinite(np.asarray(m)).all()


def test_buoyancy_control_mode_3d():
    data, domain, cfg = _dataset(seed=1)
    pde = IncompressibleFluid3DPDE(domain, cfg, control="buoyancy",
                                   unet_levels=2)
    app = ControlTraining(
        N, pde, dataset=data, batch_size=4,
        trainable_networks=("CFE",), sequence_class="chain",
        obs_loss_frames=(1, N),
    ).prepare()
    res = app.train(4, log_every=2)
    assert np.isfinite(res["loss"])
    # indirect force acts on z-faces only
    batch = data.sample(np.random.default_rng(1), 4)
    _, _, _, forces = app.infer_all_frames(batch, keep_forces=True)
    assert float(np.abs(np.asarray(forces.vy)).max()) == 0.0
    assert float(np.abs(np.asarray(forces.vx)).max()) == 0.0


def test_adjoint_optimization_3d():
    """Direct force optimization (the paper's classical baseline) works on
    volumes: the observation loss drops >=5x (the residual is the
    physically-achievable floor — the blob deforms while advected)."""
    from pde_control_tpu.control.adjoint import optimize_forces

    domain = Domain3D.create(S, S, S)
    cfg = Fluid3DConfig(dt=0.5, buoyancy=0.0, pressure_tol=1e-5,
                        pressure_maxiter=200)
    pde = IncompressibleFluid3DPDE(domain, cfg, control="direct")
    z, y, x = np.meshgrid(*([np.arange(S)] * 3), indexing="ij")
    d0 = np.exp(-((z - 2.0) ** 2 + (y - 4.0) ** 2 + (x - 4.0) ** 2) / 3.0)
    dT = np.exp(-((z - 5.0) ** 2 + (y - 4.0) ** 2 + (x - 4.0) ** 2) / 3.0)
    state0 = FluidState3D(
        velocity=Staggered3D.zeros(1, S, S, S),
        density=jnp.asarray(d0, jnp.float32)[None])
    target = jnp.asarray(dT, jnp.float32)[None, ..., None]
    forces, metrics = optimize_forces(
        pde, state0, target, n=4, iterations=200, learning_rate=0.1,
        force_reg=1e-5)
    hist = np.asarray(metrics["obs_loss"])
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0] / 5.0, (hist[0], hist[-1])
