"""Smoke tests for the OOD generalization entries (experiments/generalize.py
— VERDICT r3 item 4).

These eval-only entries restore a finished run's per-network checkpoint and
score it on held-out data axes; before the r6b recovery queue runs them
unattended at full size, this pins the whole path — checkpoint round-trip,
per-family dataset generation, the chain_final horizon-extrapolation branch
— at smoke sizes. Reference analog: infer_all_frames over val ranges
(src/control/control_training.py :: infer_all_frames [R]) applied to
out-of-generator data, which the reference never did."""

from __future__ import annotations

import json
import math
import os

import numpy as np

import jax.numpy as jnp

from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE
from pde_control_tpu.control.training import ControlTraining
from pde_control_tpu.experiments.curriculum import op_spans
from pde_control_tpu.experiments.generalize import (
    generalize_shapes,
    generalize_smoke,
    ood_obstacles,
)
from pde_control_tpu.grids import Domain2D
from pde_control_tpu.physics.fluid import FluidConfig

SIZE, N = 16, 4


def _save_random_ckpt(pde, dataset, path: str) -> str:
    """A random-init (zero-force CFE) checkpoint with the exact net
    names/shapes generalize_* will restore at smoke sizes."""
    nets = ("CFE",) + tuple(f"OP{s}" for s in op_spans(N))
    app = ControlTraining(
        N, pde=pde, dataset=dataset, val_dataset=dataset, batch_size=4,
        trainable_networks=nets, sequence_class="staggered",
        obs_loss_frames=(N,), seed=0,
    ).prepare()
    app.save(path)
    return path


def _assert_rows(results: dict, keys, workdir: str) -> None:
    for key in keys:
        row = results[key]
        assert math.isfinite(row["final_state_mse"]), (key, row)
        assert math.isfinite(row["zero_force_final_mse"]), (key, row)
        assert row["ratio_vs_zero_force"] > 0, (key, row)
    with open(os.path.join(workdir, "results.json")) as f:
        on_disk = json.load(f)
    assert set(keys) <= set(on_disk)


def test_generalize_shapes_smoke(tmp_path):
    from pde_control_tpu.data.generate import generate_forced_smoke_dataset

    domain = Domain2D.create(SIZE, SIZE)
    cfg = FluidConfig(dt=1.0, buoyancy=0.0, pressure_tol=1e-4,
                      pressure_maxiter=200, warm_start_pressure=True)
    pde = IncompressibleFluidPDE(domain, cfg, control="direct",
                                 unet_levels=2)
    data = generate_forced_smoke_dataset(domain, cfg, 8, N, seed=0,
                                         init="shapes")
    ckpt = _save_random_ckpt(pde, data, str(tmp_path / "ckpt"))
    workdir = str(tmp_path / "out")
    results = generalize_shapes(workdir, init_from=ckpt, smoke_test=True)
    _assert_rows(results, ("shapes", "crosses", "rings"), workdir)
    # A zero-init CFE applies zero force, so the controlled rollout IS the
    # zero-force rollout: the in-distribution ratio must be ~1 — this pins
    # that the two columns really run the same physics on the same data.
    assert abs(results["shapes"]["ratio_vs_zero_force"] - 1.0) < 1e-3


def test_generalize_smoke_smoke(tmp_path):
    from pde_control_tpu.data.generate import generate_inflow_smoke_dataset
    from pde_control_tpu.experiments.fluid2d import default_obstacles

    cfg = FluidConfig(dt=1.0, buoyancy=0.08, pressure_tol=1e-4,
                      pressure_maxiter=200, warm_start_pressure=True)
    domain = Domain2D.create(
        SIZE, SIZE,
        obstacle_mask=jnp.asarray(default_obstacles(SIZE, SIZE)))
    pde = IncompressibleFluidPDE(
        domain, cfg, control="buoyancy", with_inflow=True, unet_levels=2,
        cfe_features=(48, 96, 96, 48), op_base_features=16)
    data = generate_inflow_smoke_dataset(domain, cfg, 8, N, seed=0,
                                         control_amplitude=1.0)
    ckpt = _save_random_ckpt(pde, data, str(tmp_path / "ckpt"))
    workdir = str(tmp_path / "out")
    results = generalize_smoke(workdir, init_from=ckpt, smoke_test=True)
    _assert_rows(results,
                 ("in_dist", "in_dist_chain", "obstacles_ood",
                  "inflow_shifted"), workdir)


def test_ood_obstacle_course_differs_from_training_mask():
    from pde_control_tpu.experiments.fluid2d import default_obstacles

    ood = ood_obstacles(64, 64)
    train = np.asarray(default_obstacles(64, 64))
    assert ood.shape == train.shape
    assert ood.any() and train.any()
    assert (ood != train).any()
