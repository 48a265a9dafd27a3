"""Spatial domain decomposition (parallel/spatial.py) — the sharded-grid
fluid step must match the single-device one, forward and gradients, and
must KEEP its fields sharded along the 'space' mesh axis (the
memory-scaling point: one grid split across the slice's HBM). Subprocess
for the same reason as test_mesh.py: device counts are fixed at
interpreter start."""

import os
import subprocess
import sys

import pytest

from pde_control_tpu.parallel.spatial import spatial_spec


def _run(extra):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize: skip TPU register
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = os.path.join(repo, "tests", "_spatial_equality_check.py")
    return subprocess.run([sys.executable, script] + extra, env=env,
                          cwd=repo, capture_output=True, text=True,
                          timeout=900)


def test_spatial_sharded_rollout_matches_single_device():
    """Direct forcing: 3-step rollout, loss + final fields + force grads."""
    out = _run([])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL_EQUALITY_OK" in out.stdout, out.stdout + "\n" + out.stderr


def test_spatial_pcg_matches_dense_pcg():
    """Distributed spectral-preconditioned CG (round 4): same rollout /
    grads as the dense deflated-spectral PCG on an obstacle domain."""
    out = _run(["--pcg"])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL_PCG_OK" in out.stdout, out.stdout + "\n" + out.stderr


def test_spatial_exact_spectral_matches_dense():
    """Distributed exact DCT solve (round 4): no CG at all; must match the
    dense spectral path on an obstacle-free closed domain."""
    out = _run(["--spectral"])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL_SPECTRAL_OK" in out.stdout, (
        out.stdout + "\n" + out.stderr)


def test_spatial_pcg2_matches_dense():
    """Two-level distributed PCG (spectral + Galerkin coarse space,
    round 4): same rollout/grads as the dense one-level PCG at tight tol
    on an obstacle domain."""
    out = _run(["--pcg2"])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL_PCG2_OK" in out.stdout, out.stdout + "\n" + out.stderr


def test_spatial_pcg2_cuts_iteration_counts():
    """The coarse space must reduce CG trips on the scaled-plate layout
    (the round-4 scaling table's residual O(N) growth)."""
    out = _run(["--iters2"])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL_ITERS2_OK" in out.stdout, out.stdout + "\n" + out.stderr


def test_spatial_adjoint_optimization_decreases():
    """parallel/spatial_opt.py (round 4): the distributed adjoint loop —
    scan of remat'd sharded steps under value_and_grad + adam — improves
    the objective and keeps the optimization variables sharded."""
    out = _run(["--opt"])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL_OPT_OK" in out.stdout, out.stdout + "\n" + out.stderr


def test_spatial_sharded_indirect_inflow_warmstart():
    """Indirect control (per-batch buoyancy factor) + inflow + warm-started
    pressure: the gradient wrt the control channel must match."""
    out = _run(["--indirect"])
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "SPATIAL_INDIRECT_OK" in out.stdout, out.stdout + "\n" + out.stderr


def test_spatial_spec_convention():
    """The leaf-rank → PartitionSpec table from the module docstring."""
    from jax.sharding import PartitionSpec as P

    assert spatial_spec(3, 2) == P("data", "space", None)      # (B, H, W)
    assert spatial_spec(2, 2) == P("space", None)              # (H, W) mask
    assert spatial_spec(4, 3) == P("data", "space", None, None)
    assert spatial_spec(3, 3) == P("space", None, None)        # (D, H, W)
    assert spatial_spec(1, 2) == P()                           # replicated
    with pytest.raises(ValueError):
        spatial_spec(3, 4)


def test_spatial_step_scope_validation():
    """The documented scope restrictions fail fast with clear messages."""
    from pde_control_tpu.grids import Domain2D
    from pde_control_tpu.physics.fluid import FluidConfig, FluidState

    # No devices needed: every validation fires before shard_map tracing,
    # and only mesh.shape is read — a duck-typed stub suffices.
    import types

    mesh = types.SimpleNamespace(shape={"data": 1, "space": 2})
    state = FluidState.zeros(2, 16, 16)
    from pde_control_tpu.parallel.spatial import spatial_fluid_step

    open_domain = Domain2D.create(16, 16, closed=False)
    with pytest.raises(ValueError, match="closed"):
        spatial_fluid_step(state, open_domain, FluidConfig(), mesh)
    domain = Domain2D.create(16, 16)
    with pytest.raises(ValueError, match="viscosity"):
        spatial_fluid_step(state, domain, FluidConfig(viscosity=0.1), mesh)
    with pytest.raises(ValueError, match="shift"):
        spatial_fluid_step(state, domain,
                           FluidConfig(advection_mode="gather"), mesh)
    with pytest.raises(ValueError, match="single-device"):
        spatial_fluid_step(state, domain,
                           FluidConfig(pressure_backend="pallas"), mesh)
    import jax.numpy as jnp
    import numpy as np

    obs = np.zeros((16, 16), np.float32)
    obs[8, 4:12] = 1.0
    obs_domain = Domain2D.create(16, 16, obstacle_mask=jnp.asarray(obs))
    with pytest.raises(ValueError, match="obstacles"):
        spatial_fluid_step(state, obs_domain,
                           FluidConfig(pressure_backend="spectral"), mesh)
    mesh3 = types.SimpleNamespace(shape={"data": 1, "space": 3})
    with pytest.raises(ValueError, match="divisible"):
        spatial_fluid_step(state, domain, FluidConfig(), mesh3)
    mesh8 = types.SimpleNamespace(shape={"data": 1, "space": 8})
    with pytest.raises(ValueError, match="max_shift"):
        spatial_fluid_step(state, domain, FluidConfig(max_shift=2), mesh8)
