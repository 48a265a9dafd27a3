"""Driver-gate regression tests (VERDICT r1 item 1).

`dryrun_multichip` must pass when invoked from an interpreter whose JAX
backend is pinned to the axon TPU plugin at startup (the driver's calling
convention) — even when the chip is unreachable. The fix is a hermetic
CPU-only subprocess re-exec; this test reproduces the driver's environment
(PALLAS_AXON_POOL_IPS set, JAX_PLATFORMS=axon) and asserts the gate goes
green without ever touching a TPU backend.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_hermetic_from_axon_pinned_env():
    env = dict(os.environ)
    # Reproduce the driver env: axon session vars present. Point the pool IP
    # at a blackhole so any accidental TPU touch fails fast instead of
    # wedging the chip.
    env.setdefault("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    env["JAX_PLATFORMS"] = "axon"
    env["PYTHONPATH"] = (REPO + os.pathsep + env.get("PYTHONPATH", ""))
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "dryrun_multichip(8): ok" in out.stdout, out.stdout
    assert "platform=cpu" in out.stdout, out.stdout
