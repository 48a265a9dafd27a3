"""3D spatial domain decomposition (parallel/spatial3d.py) — the z-sharded
volume step must match the single-device physics/fluid3d.py one, forward
and gradients, and keep its fields sharded along 'space'. Subprocess for
the same reason as test_spatial.py: device counts are fixed at interpreter
start."""

import os
import subprocess
import sys

import pytest


def _run(extra):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize: skip TPU register
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = os.path.join(repo, "tests", "_spatial3d_equality_check.py")
    return subprocess.run([sys.executable, script] + extra, env=env,
                          cwd=repo, capture_output=True, text=True,
                          timeout=900)


def test_spatial3d_sharded_rollout_matches_single_device():
    """Direct forcing: 2-step volume rollout, loss + fields + force grads."""
    out = _run([])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL3D_EQUALITY_OK" in out.stdout, (
        out.stdout + "\n" + out.stderr)


def test_spatial3d_exact_spectral_matches_dense():
    """Distributed exact 3D DCT solve (two psum_scatters per apply): no CG
    at all; must match the dense spectral path on an obstacle-free
    closed domain — the production 3D smoke-task configuration."""
    out = _run(["--spectral"])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL3D_SPECTRAL_OK" in out.stdout, (
        out.stdout + "\n" + out.stderr)


def test_spatial3d_pcg_matches_dense():
    """Distributed 3D spectral-preconditioned CG on an obstacle domain."""
    out = _run(["--pcg"])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL3D_PCG_OK" in out.stdout, out.stdout + "\n" + out.stderr


def test_spatial3d_indirect_inflow_warmstart():
    """3D indirect control: per-batch AND full-field buoyancy factors +
    inflow + warm-started pressure — control-channel gradients match."""
    out = _run(["--indirect"])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL3D_INDIRECT_OK" in out.stdout, (
        out.stdout + "\n" + out.stderr)


def test_spatial3d_pcg_cuts_iteration_counts():
    """The distributed 3D spectral preconditioner must cut CG trips >=3x
    on a 32^3 obstacle domain."""
    out = _run(["--iters"])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL3D_ITERS_OK" in out.stdout, out.stdout + "\n" + out.stderr


def test_spatial3d_step_scope_validation():
    """Documented scope restrictions fail fast with clear messages."""
    import types

    import jax.numpy as jnp
    import numpy as np

    from pde_control_tpu.grids3d import Domain3D
    from pde_control_tpu.parallel.spatial3d import spatial_fluid3d_step
    from pde_control_tpu.physics.fluid3d import Fluid3DConfig, FluidState3D

    mesh = types.SimpleNamespace(shape={"data": 1, "space": 2})
    state = FluidState3D.zeros(2, 16, 16, 16)
    open_domain = Domain3D.create(16, 16, 16, closed=False)
    with pytest.raises(ValueError, match="closed"):
        spatial_fluid3d_step(state, open_domain, Fluid3DConfig(), mesh)
    domain = Domain3D.create(16, 16, 16)
    with pytest.raises(ValueError, match="viscosity"):
        spatial_fluid3d_step(state, domain, Fluid3DConfig(viscosity=0.1),
                             mesh)
    with pytest.raises(ValueError, match="shift"):
        spatial_fluid3d_step(state, domain,
                             Fluid3DConfig(advection_mode="gather"), mesh)
    obs = np.zeros((16, 16, 16), np.float32)
    obs[8, 4:12, 4:12] = 1.0
    obs_domain = Domain3D.create(16, 16, 16, obstacle_mask=jnp.asarray(obs))
    with pytest.raises(ValueError, match="obstacles"):
        spatial_fluid3d_step(state, obs_domain,
                             Fluid3DConfig(pressure_backend="spectral"),
                             mesh)
    mesh3 = types.SimpleNamespace(shape={"data": 1, "space": 3})
    with pytest.raises(ValueError, match="divisible"):
        spatial_fluid3d_step(state, domain, Fluid3DConfig(), mesh3)
    mesh8 = types.SimpleNamespace(shape={"data": 1, "space": 8})
    with pytest.raises(ValueError, match="max_shift"):
        spatial_fluid3d_step(state, domain, Fluid3DConfig(max_shift=2),
                             mesh8)
