"""Control-stack tests: nets, sequences, data, staged training, mesh DP.

Mirrors SURVEY.md §4's plan: integration "smoke" curricula at tiny sizes
asserting loss decreases, plus multi-device numerical-equality checks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pde_control_tpu.control.pde_burgers import BurgersPDE
from pde_control_tpu.control.sequences import staggered_targets
from pde_control_tpu.control.training import ControlTraining
from pde_control_tpu.data.generate import generate_burgers_dataset
from pde_control_tpu.data.scene import SceneDataset, TrajectoryDataset
from pde_control_tpu.models.nets import CFENet, UNet
from pde_control_tpu.physics.burgers import BurgersConfig
from pde_control_tpu.utils.checkpoint import restore_networks, save_networks

CFG = BurgersConfig(n=16, dt=0.5, viscosity=0.05)


@pytest.fixture(scope="module")
def burgers_data():
    return generate_burgers_dataset(CFG, num=96, n_steps=4, seed=0)


def test_net_shapes():
    x1 = jnp.zeros((2, 16, 3))
    out = UNet(out_channels=1, levels=2, base_features=4, dim=1).init_with_output(
        jax.random.PRNGKey(0), x1)[0]
    assert out.shape == (2, 16, 1)
    x2 = jnp.zeros((2, 16, 16, 5))
    out = CFENet(out_channels=2, features=(8, 8), dim=2).init_with_output(
        jax.random.PRNGKey(0), x2)[0]
    assert out.shape == (2, 16, 16, 2)


def test_staggered_targets_structure():
    calls = []

    def fake_op(span, a, b):
        calls.append(span)
        return (a + b) / 2

    o0 = jnp.zeros((1, 4, 1))
    on = jnp.ones((1, 4, 1))
    ts = staggered_targets(fake_op, o0, on, 8)
    assert len(ts) == 9
    np.testing.assert_allclose(np.asarray(ts[0]), 0.0)
    np.testing.assert_allclose(np.asarray(ts[8]), 1.0)
    # level-batched subdivision: ONE op call per level (spans 8, 4, 2),
    # with all same-level spans folded into the batch axis
    assert calls == [8, 4, 2]
    # midpoints of linear interp: target i == i/8 exactly
    for i in range(9):
        np.testing.assert_allclose(np.asarray(ts[i]), i / 8.0, atol=1e-6)


def test_scene_roundtrip(tmp_path, burgers_data):
    root = str(tmp_path / "scenes")
    ds = SceneDataset(root, sim_range=range(4))
    ds.write_trajectories(burgers_data.obs[:4])
    loaded = ds.load_trajectories()
    np.testing.assert_allclose(loaded.obs, burgers_data.obs[:4], atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    pde = BurgersPDE(CFG)
    app = ControlTraining(2, pde, sequence_class="staggered").prepare()
    d = str(tmp_path / "ckpt")
    app.save(d)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, app.params)
    restored = restore_networks(d, zeroed)
    for name in app.params:
        a = jax.tree_util.tree_leaves(app.params[name])
        b = jax.tree_util.tree_leaves(restored[name])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_cfe_supervised_chain_loss_decreases(burgers_data):
    pde = BurgersPDE(CFG)
    app = ControlTraining(
        4, pde, dataset=burgers_data, batch_size=16,
        trainable_networks=("CFE",), sequence_class="chain",
        obs_loss_frames=(1, 2, 3, 4), force_reg=1e-4,
        learning_rate=2e-3, seed=0,
    ).prepare()
    first = app.progress()
    loss0 = float(first["loss"])
    last = app.train(60, log_every=60)
    assert last["loss"] < 0.6 * loss0, (loss0, last)


def test_op_supervised_then_staggered_runs(burgers_data, tmp_path):
    pde = BurgersPDE(CFG)
    # Stage: OP supervised (both levels at once for test speed).
    op_app = ControlTraining(
        4, pde, dataset=burgers_data, batch_size=16,
        trainable_networks=("OP2", "OP4"), sequence_class="op_supervised",
        learning_rate=2e-3,
    ).prepare()
    m0 = op_app.progress()
    last = op_app.train(40, log_every=40)
    assert last["loss"] < float(m0["loss"])
    ckpt = str(tmp_path / "ops")
    op_app.save(ckpt)

    # Stage: end-to-end staggered restoring the OP checkpoints.
    e2e = ControlTraining(
        4, pde, dataset=burgers_data, batch_size=8,
        trainable_networks=("CFE",), sequence_class="staggered",
        obs_loss_frames=(4,), restore=ckpt, learning_rate=1e-3,
    ).prepare()
    # restored OPs must match saved ones
    for name in ("OP2", "OP4"):
        for x, y in zip(jax.tree_util.tree_leaves(op_app.params[name]),
                        jax.tree_util.tree_leaves(e2e.params[name])):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    metrics = e2e.progress()
    assert np.isfinite(float(metrics["loss"]))
    obs_traj, costs, final = e2e.infer_all_frames(
        burgers_data.sample(np.random.default_rng(0), 4))
    assert obs_traj.shape[0] == 4 and np.isfinite(np.asarray(obs_traj)).all()


def test_refined_sequence_runs(burgers_data):
    pde = BurgersPDE(CFG)
    app = ControlTraining(
        4, pde, dataset=burgers_data, batch_size=4,
        trainable_networks=("CFE", "OP2", "OP4"), sequence_class="refined",
        obs_loss_frames=(4,),
    ).prepare()
    m = app.progress()
    assert np.isfinite(float(m["loss"]))


def test_infer_keep_states(burgers_data):
    pde = BurgersPDE(CFG)
    app = ControlTraining(
        2, pde, dataset=burgers_data, batch_size=4,
        trainable_networks=("CFE",), sequence_class="chain",
        obs_loss_frames=(1, 2),
    ).prepare()
    batch = burgers_data.sample(np.random.default_rng(0), 4)
    obs_traj, costs, final, states = app.infer_all_frames(batch,
                                                          keep_states=True)
    assert states.shape == (2, 4, 16)  # (T, B, N) full Burgers states
    np.testing.assert_allclose(np.asarray(states[-1]), np.asarray(final),
                               atol=1e-6)


def test_training_state_resume(burgers_data, tmp_path):
    pde = BurgersPDE(CFG)

    def make():
        return ControlTraining(
            2, pde, dataset=burgers_data, batch_size=4,
            trainable_networks=("CFE",), sequence_class="chain",
            obs_loss_frames=(1, 2), seed=7,
        ).prepare()

    app = make()
    app.train(5, log_every=5)
    d = str(tmp_path / "resume")
    app.save_state(d)
    batch = burgers_data.sample(np.random.default_rng(3), 4)
    ref_metrics = app.progress(batch)

    app2 = make()
    app2.restore_state(d)
    assert app2.step_count == 5
    got = app2.progress(batch)
    np.testing.assert_allclose(float(got["loss"]), float(ref_metrics["loss"]),
                               rtol=1e-6)


def test_chain_final_greedy_sequence(burgers_data):
    # Greedy mode: every step targets the FINAL observation (no OPs).
    pde = BurgersPDE(CFG)
    app = ControlTraining(
        4, pde, dataset=burgers_data, batch_size=4,
        trainable_networks=("CFE",), sequence_class="chain_final",
        obs_loss_frames=(4,),
    ).prepare()
    m = app.progress()
    assert np.isfinite(float(m["loss"]))
    obs_traj, costs, final = app.infer_all_frames(
        burgers_data.sample(np.random.default_rng(0), 4))
    assert obs_traj.shape[0] == 4


def test_cosine_schedule_decays_over_stage(burgers_data):
    # VERDICT r1 item 10: decay horizon must come from the stage length, not
    # a fixed 100k constant that never decays for 300-2000-iter stages.
    pde = BurgersPDE(CFG)
    app = ControlTraining(
        4, pde, dataset=burgers_data, batch_size=4,
        trainable_networks=("CFE",), sequence_class="chain",
        lr_schedule="cosine", decay_steps=500, learning_rate=1e-3,
    ).prepare()
    lr0 = float(app.lr_schedule_fn(0))
    lr_end = float(app.lr_schedule_fn(500))
    assert lr0 == pytest.approx(1e-3)
    assert lr_end < 0.2 * lr0
    with pytest.raises(ValueError, match="decay_steps"):
        ControlTraining(
            4, pde, dataset=burgers_data, batch_size=4,
            trainable_networks=("CFE",), sequence_class="chain",
            lr_schedule="cosine",
        )


def test_infer_keep_forces_exposes_force_fields(burgers_data):
    # VERDICT r1 item 5: inference must expose the actual control forces,
    # not just their scalar costs, for every sequence class.
    pde = BurgersPDE(CFG)
    for seq, nets in [("chain", ("CFE",)),
                      ("staggered", ("CFE", "OP2", "OP4")),
                      ("refined", ("CFE", "OP2", "OP4"))]:
        app = ControlTraining(
            4, pde, dataset=burgers_data, batch_size=4,
            trainable_networks=nets, sequence_class=seq,
            obs_loss_frames=(4,),
        ).prepare()
        batch = burgers_data.sample(np.random.default_rng(0), 4)
        obs_traj, costs, final, forces = app.infer_all_frames(
            batch, keep_forces=True)
        assert forces.shape == (4, 4, 16), (seq, forces.shape)  # (T, B, N)
        # costs must be consistent with the exposed forces
        recomputed = jax.vmap(pde.force_cost)(forces)
        np.testing.assert_allclose(np.asarray(recomputed), np.asarray(costs),
                                   rtol=1e-5, atol=1e-7)
        # paper metric: mean |F| is finite and >= 0
        mab = np.asarray(jax.vmap(pde.force_abs_mean)(forces))
        assert mab.shape == (4, 4) and np.isfinite(mab).all()


def test_refined_scan_matches_unrolled_toy():
    # run_refined_scan is the O(log n)-program rewrite of run_refined (the
    # unrolled recursion never compiled at n=128). Pin them EQUAL — values,
    # aux, states, and gradients — on nonlinear toy dynamics where any
    # target-stack bookkeeping error (wrong parent, missed right-child
    # inherit, wrong cascade order) changes the numbers.
    from pde_control_tpu.control.sequences import (
        run_refined,
        run_refined_scan,
    )

    def observe(state):
        return state["x"][..., None]

    def step_fn(state, tgt):
        force = 0.3 * (tgt[..., 0] - state["x"]) + 0.01 * state["v"]
        x = state["x"] + 0.5 * jnp.tanh(state["v"]) + force
        v = state["v"] * 0.9 + 0.1 * force
        return {"x": x, "v": v}, {"cost": jnp.sum(force ** 2, axis=-1)}

    def op_fn(span, o_a, o_b):
        # span-dependent and NON-midpoint so left/right children differ
        return 0.5 * (o_a + o_b) + 0.05 * span * jnp.sin(o_a * o_b)

    rng = np.random.default_rng(0)
    state0 = {"x": jnp.asarray(rng.normal(size=(3, 4)), jnp.float32),
              "v": jnp.asarray(rng.normal(size=(3, 4)), jnp.float32)}
    target = jnp.asarray(rng.normal(size=(3, 4, 1)), jnp.float32)

    for n in (1, 2, 8):
        for remat in (True, False):
            ref = run_refined(step_fn, op_fn, observe, state0, target, n,
                              remat, keep_states=True)
            got = run_refined_scan(step_fn, op_fn, observe, state0, target,
                                   n, remat, keep_states=True)
            for r, g in zip(jax.tree_util.tree_leaves(ref),
                            jax.tree_util.tree_leaves(got)):
                np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                           rtol=1e-5, atol=1e-6)

    def loss(runner, state0, target):
        final, obs_traj, aux = runner(step_fn, op_fn, observe, state0,
                                      target, 8, True)
        return (jnp.mean((obs_traj[-1] - target) ** 2)
                + 1e-2 * jnp.mean(aux["cost"]))

    g_ref = jax.grad(lambda s, t: loss(run_refined, s, t),
                     argnums=(0, 1))(state0, target)
    g_scan = jax.jit(jax.grad(lambda s, t: loss(run_refined_scan, s, t),
                              argnums=(0, 1)))(state0, target)
    for r, g in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=1e-4, atol=1e-6)


def test_refined_impl_scan_matches_unrolled_app(burgers_data):
    # Same pin through the full ControlTraining stack (real CFE/OP nets):
    # identical loss and identical parameter gradients.
    pde = BurgersPDE(CFG)

    def make(impl):
        return ControlTraining(
            4, pde, dataset=burgers_data, batch_size=4,
            trainable_networks=("CFE", "OP2", "OP4"),
            sequence_class="refined", obs_loss_frames=(4,), seed=11,
            refined_impl=impl,
        ).prepare()

    a, b = make("unrolled"), make("scan")
    assert a.refined_impl == "unrolled" and b.refined_impl == "scan"
    batch = {k: jnp.asarray(v) for k, v in
             burgers_data.sample(np.random.default_rng(5), 4).items()}
    (la, _), ga = jax.value_and_grad(a._loss_fn, has_aux=True)(a.params,
                                                               batch)
    (lb, _), gb = jax.value_and_grad(b._loss_fn, has_aux=True)(b.params,
                                                               batch)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for r, g in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=2e-4, atol=1e-6)
    # 'auto' routes by horizon: unrolled below 32, scan at 32+.
    assert ControlTraining(4, pde, sequence_class="refined",
                           ).refined_impl == "unrolled"
    assert ControlTraining(32, pde, sequence_class="refined",
                           ).refined_impl == "scan"


def test_refined_keep_states(burgers_data):
    # keep_states previously raised NotImplementedError for refined.
    pde = BurgersPDE(CFG)
    app = ControlTraining(
        4, pde, dataset=burgers_data, batch_size=4,
        trainable_networks=("CFE", "OP2", "OP4"), sequence_class="refined",
        obs_loss_frames=(4,),
    ).prepare()
    batch = burgers_data.sample(np.random.default_rng(0), 4)
    obs_traj, costs, final, states, forces = app.infer_all_frames(
        batch, keep_states=True, keep_forces=True)
    assert states.shape == (4, 4, 16) and forces.shape == (4, 4, 16)
    np.testing.assert_allclose(np.asarray(states[-1]), np.asarray(final),
                               atol=1e-6)
    # the stacked observation trajectory must equal observe(states)
    np.testing.assert_allclose(np.asarray(obs_traj),
                               np.asarray(states)[..., None], atol=1e-6)


def test_progress_multi_matches_single_steps(burgers_data):
    # K fused steps in one device program == K separate steps, exactly the
    # same math (dispatch amortization must not change results).
    pde = BurgersPDE(CFG)

    def make():
        return ControlTraining(
            2, pde, dataset=burgers_data, batch_size=4,
            trainable_networks=("CFE",), sequence_class="chain",
            obs_loss_frames=(1, 2), seed=7,
        ).prepare()

    a, b = make(), make()
    rng = np.random.default_rng(5)
    batches = [burgers_data.sample(rng, 4) for _ in range(4)]
    for bt in batches:
        a.progress(bt)
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
    metrics = b.progress_multi(stacked)
    assert metrics["loss"].shape == (4,)
    assert a.step_count == b.step_count == 4
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


def test_train_fused_loop(burgers_data, tmp_path):
    pde = BurgersPDE(CFG)
    app = ControlTraining(
        2, pde, dataset=burgers_data, batch_size=4,
        trainable_networks=("CFE",), sequence_class="chain",
        obs_loss_frames=(1, 2), logdir=str(tmp_path / "logs"),
    ).prepare()
    last = app.train(10, log_every=4, steps_per_call=4)
    # iterations round UP to whole fused chunks (a short tail chunk would
    # compile a second full program); 10 @ k=4 -> 12 steps.
    assert app.step_count == 12
    assert np.isfinite(last["loss"]) and last["steps_per_sec"] > 0


def test_device_dataset_matches_host_sampling(burgers_data):
    from pde_control_tpu.data.scene import DeviceDataset

    dev = DeviceDataset.wrap(burgers_data)
    host_batch = burgers_data.sample(np.random.default_rng(3), 8)
    dev_batch = dev.sample(np.random.default_rng(3), 8)
    assert set(host_batch) == set(dev_batch)
    for k in host_batch:
        np.testing.assert_allclose(np.asarray(dev_batch[k]), host_batch[k],
                                   atol=0)
    # stacked sampling: shape contract for progress_multi
    stacked = dev.sample_stacked(np.random.default_rng(4), 3, 8)
    assert stacked["obs"].shape[:2] == (3, 8)
    # wrap is idempotent and training auto-wraps
    assert DeviceDataset.wrap(dev) is dev
    pde = BurgersPDE(CFG)
    app = ControlTraining(2, pde, dataset=burgers_data, batch_size=4,
                          trainable_networks=("CFE",), sequence_class="chain",
                          obs_loss_frames=(1,)).prepare()
    assert isinstance(app.dataset, DeviceDataset)
    m = app.progress()
    assert np.isfinite(float(m["loss"]))


def test_train_autosave_and_mid_stage_resume(burgers_data, tmp_path):
    """Mid-stage crash recovery (round 3): train() periodically autosaves
    the full training state; a fresh app with autosave_restore=True picks
    up the saved step count and runs only the remaining iterations, with
    identical params at the restore point."""
    pde = BurgersPDE(CFG)

    def make():
        return ControlTraining(
            2, pde, dataset=burgers_data, batch_size=4,
            trainable_networks=("CFE",), sequence_class="chain",
            obs_loss_frames=(1, 2), seed=7,
        ).prepare()

    d = str(tmp_path / "autosave")
    app = make()
    # 6 steps with autosave_every=2 (fused k=2): autosave left at step 6.
    app.train(6, log_every=10, steps_per_call=2,
              autosave_dir=d, autosave_every=2)
    import os

    assert os.path.exists(os.path.join(d, "state.json"))
    saved_params = jax.device_get(app.params)

    # "Crashed" run restarts: restores step 6, runs only 10-6=4 more.
    app2 = make()
    out = app2.train(10, log_every=10, steps_per_call=2,
                     autosave_dir=d, autosave_every=100,
                     autosave_restore=True)
    assert out["resumed_mid_stage"] == 6
    assert out["iterations_run"] == 10  # stage total, not the remainder
    assert app2.step_count == 10
    # The restore really loaded the autosaved params (not fresh-init ones):
    app3 = make()
    assert app3.try_restore_autosave(d) == 6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(app3.params), saved_params)

    # Already-complete stage: nothing to run; iterations_run reports the
    # stage TOTAL (the ADVICE-r2 contract: the actual optimizer-step
    # count), all of which ran in prior invocations.
    app4 = make()
    out = app4.train(6, autosave_dir=d, autosave_restore=True)
    assert out == {"resumed_mid_stage": 6, "iterations_run": 6}

    # Unfused path autosaves too.
    d2 = str(tmp_path / "autosave2")
    app5 = make()
    app5.train(3, log_every=10, autosave_dir=d2, autosave_every=2)
    app6 = make()
    assert app6.try_restore_autosave(d2) == 2
