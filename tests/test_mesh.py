"""Multi-device data-parallel tests (SURVEY.md §4 item 5).

The sharded train step must match the single-device step numerically — the
rebuild's analog of the reference's NumPy-vs-TF dual-backend cross-check.
Runs in a clean subprocess: the axon sitecustomize pins the platform at
interpreter startup, so an 8-device virtual CPU mesh needs a fresh process
with XLA_FLAGS set from the start.
"""

import os
import subprocess
import sys


def test_mesh_dp_matches_single_device():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize: skip TPU register
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = os.path.join(repo, "tests", "_mesh_equality_check.py")
    out = subprocess.run(
        [sys.executable, script], env=env, cwd=repo,
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "MESH_EQUALITY_OK" in out.stdout, out.stdout + "\n" + out.stderr


def test_mesh_dp_matches_single_device_3d():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = os.path.join(repo, "tests", "_mesh_equality_check.py")
    out = subprocess.run(
        [sys.executable, script, "--3d"], env=env, cwd=repo,
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "MESH_EQUALITY_3D_OK" in out.stdout, out.stdout + "\n" + out.stderr
