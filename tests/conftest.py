"""Test configuration: 8-device virtual CPU mesh (SURVEY.md §4 item 5).

The axon sitecustomize imports jax at interpreter startup and pins
`jax_platforms="axon,cpu"`, so env vars set here are too late — but
`jax.config.update` still works because no backend is initialized yet.
Running tests on CPU (a) gives 8 devices for sharding tests and (b) avoids
the axon remote-compile relay, which makes compiles erratically slow.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
