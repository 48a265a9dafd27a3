"""Non-finite-update protection (round 3).

A single NaN/Inf gradient step must not poison the params: the optimizer
skips the update (optax.apply_if_finite) and training continues — one bad
batch costs one step, not the run (observed in production: a 3D CFE stage
hit one non-finite step and every later curriculum stage trained on NaN
params). Persistent divergence aborts the stage with RuntimeError instead
of burning the remaining budget.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pde_control_tpu.control.pde_burgers import BurgersPDE
from pde_control_tpu.control.training import ControlTraining
from pde_control_tpu.data.generate import generate_burgers_dataset
from pde_control_tpu.physics.burgers import BurgersConfig

CFG = BurgersConfig(n=16, dt=0.5, viscosity=0.05)


def _finite(params) -> bool:
    return all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(params))


@pytest.fixture(scope="module")
def app():
    data = generate_burgers_dataset(CFG, num=32, n_steps=4, seed=0)
    return ControlTraining(4, BurgersPDE(CFG), dataset=data, batch_size=8,
                           sequence_class="chain", seed=0).prepare()


def test_nan_batch_is_skipped_and_training_recovers(app):
    rng = np.random.default_rng(0)
    good = app.dataset.sample(rng, 8)
    m0 = app.progress(good)
    assert float(m0["notfinite_total"]) == 0
    params_before = jax.tree_util.tree_map(np.asarray, app.params)

    bad = dict(good)
    bad["obs"] = np.asarray(good["obs"]).copy()
    bad["obs"][0, -1] = np.nan  # poisons the loss -> NaN gradients
    m1 = app.progress(bad)
    assert not np.isfinite(float(m1["loss"]))
    assert float(m1["notfinite_total"]) == 1
    assert float(m1["notfinite_consec"]) == 1
    # params must be EXACTLY the pre-step values (update skipped)
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(app.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    m2 = app.progress(good)  # recovery: next finite batch applies normally
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["notfinite_consec"]) == 0
    assert float(m2["notfinite_total"]) == 1
    assert _finite(app.params)


def test_divergence_abort_raises():
    data = generate_burgers_dataset(CFG, num=16, n_steps=2, seed=0)
    data.obs[:] = np.nan  # every batch non-finite: persistent divergence
    app = ControlTraining(2, BurgersPDE(CFG), dataset=data, batch_size=4,
                          sequence_class="chain", seed=0,
                          divergence_abort=4).prepare()
    with pytest.raises(RuntimeError, match="diverged"):
        app.train(16, log_every=4, render=False)
    assert _finite(app.params)  # params never poisoned, only stuck


def test_restore_refuses_poisoned_checkpoint(tmp_path, app):
    """A checkpoint written by a diverged run must fail at LOAD time, not
    silently seed hours of NaN training (the round-3 failure mode)."""
    import os

    from pde_control_tpu.utils.checkpoint import load_network, save_networks

    poisoned = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, jnp.nan), jax.device_get(app.params))
    save_networks(str(tmp_path), poisoned)
    with pytest.raises(ValueError, match="non-finite"):
        load_network(os.path.join(str(tmp_path), "CFE.msgpack"),
                     jax.device_get(app.params)["CFE"])


def test_fused_loop_carries_nonfinite_metrics(app):
    m = app.train(4, steps_per_call=2, log_every=2, render=False)
    assert "notfinite_consec" in m and "notfinite_total" in m
    assert np.isfinite(m["loss"])
