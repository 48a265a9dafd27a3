"""2D fluid experiments — BASELINE configs 3-5.

All three tasks are NON-degenerate (VERDICT r1 item 2): the observed
trajectories are generated under WITHHELD random forcing, so the target
frame differs from the natural evolution of the supplied initial state and
zero control force cannot reproduce it (evaluate_control reports the
zero-force baseline alongside the controlled MSE to prove it).

  * shape transition (config 3): 64², direct velocity forcing; dataset =
    geom-rasterized shapes (circles/boxes) pushed by withheld random forces.
  * smoke indirect control (config 4): inflow-driven plume through an
    obstacle course, steered by withheld buoyancy-modulation forcing;
    the CFE controls ONLY an upward force ∝ smoke density (indirect).
  * forced-flow reconstruction (config 5): 128-step rollouts under withheld
    forcing, data-parallel over the TPU mesh.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE
from pde_control_tpu.data.generate import (
    generate_forced_smoke_dataset,
    generate_inflow_smoke_dataset,
)
from pde_control_tpu.experiments.curriculum import (
    CurriculumConfig,
    finetune_e2e,
    run_curriculum,
)
from pde_control_tpu.grids import Domain2D
from pde_control_tpu.physics.fluid import FluidConfig


def _physics_key(cfg) -> dict:
    """Physics fields baked into generated data, included in the disk-cache
    key (round-3 fix: a dt/buoyancy/solver retune must invalidate cached
    datasets, not silently reuse trajectories from the old physics).
    Excludes 'fused' (a codegen routing knob, same math to tol)."""
    import dataclasses

    d = dataclasses.asdict(cfg)
    d.pop("fused", None)
    return d


def _maybe_cached(datadir, split: str, params: dict, build):
    """Route dataset generation through the disk cache when --datadir is
    given (generate once to a scene tree, reload thereafter — the
    reference's workflow; VERDICT r2 missing #1)."""
    if datadir is None:
        return build()
    import os

    from pde_control_tpu.data.scene import load_or_generate

    return load_or_generate(os.path.join(datadir, split), params, build)


def default_obstacles(h: int, w: int) -> np.ndarray:
    """The smoke task's obstacle course: two staggered plates [R?],
    built from geom boxes ~2 cell-rows thick so the plume must route
    around. Rasterization is boundary-inclusive (geom.rasterize): at the
    production sizes the fractional bounds (0.45·h etc.) fall between
    cell centers and cover exactly 2 rows; sizes where a bound lands on
    an integer center gain one row."""
    from pde_control_tpu.geom import Box, rasterize, union

    course = union(
        Box(y0=h * 0.45, x0=w * 0.10, y1=h * 0.45 + 2, x1=w * 0.55),
        Box(y0=h * 0.72, x0=w * 0.45, y1=h * 0.72 + 2, x1=w * 0.90),
    )
    return np.asarray(rasterize(course, h, w))


def _shape_transition_setup(size: int, n: int, num_train: int,
                            num_val: int, datadir: str | None):
    """Config 3's (pde, train, val) — shared by the main curriculum and
    the fine-tune entry (same generation seeds, same disk-cache keys)."""
    domain = Domain2D.create(size, size)
    cfg = FluidConfig(dt=1.0, buoyancy=0.0, pressure_tol=1e-4,
                      pressure_maxiter=200, warm_start_pressure=True)
    base = dict(task="shape_transition", size=size, n=n, init="shapes",
                physics=_physics_key(cfg), force_amplitude=0.1)
    # force_amplitude pins the generator default into the cache key — a
    # retune must invalidate cached trajectories (same class of bug as
    # the _physics_key omission).
    train = _maybe_cached(
        datadir, "train", dict(base, num=num_train, seed=0),
        lambda: generate_forced_smoke_dataset(domain, cfg, num_train, n,
                                              seed=0, init="shapes"))
    val = _maybe_cached(
        datadir, "val", dict(base, num=num_val, seed=999),
        lambda: generate_forced_smoke_dataset(domain, cfg, num_val, n,
                                              seed=999, init="shapes"))
    pde = IncompressibleFluidPDE(domain, cfg, control="direct",
                                 unet_levels=3 if size >= 32 else 2)
    return pde, train, val


def run_shape_transition(workdir: str, size: int = 64, n: int = 16,
                         iterations: int = 500, num_train: int = 256,
                         num_val: int = 32, batch_size: int = 8,
                         mesh=None, datadir: str | None = None,
                         seed: int = 0, resume: bool = False) -> dict:
    """Config 3: 64² shape transition with direct forcing — geom shapes
    pushed by withheld random forces."""
    pde, train, val = _shape_transition_setup(size, n, num_train, num_val,
                                              datadir)
    # force_reg sized so the reg term stays well under the obs MSE at
    # convergence — re-measured each round: at 1e-4 the converged run's
    # reg term (force_cost ≈ 11) was still 5× the obs loss.
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            cfe_iterations=iterations,
                            op_iterations=iterations,
                            e2e_iterations=iterations,
                            grad_clip=1.0,
                            force_reg=1e-5, seed=seed)
    return run_curriculum(pde, ccfg, train, val, workdir, mesh=mesh,
                          resume=resume)


def run_shape_transition_ft(workdir: str, init_from: str,
                            force_reg: float = 5e-6,
                            size: int = 64, n: int = 16,
                            num_train: int = 256, num_val: int = 32,
                            batch_size: int = 8,
                            e2e_iterations: int | None = None,
                            mesh=None, datadir: str | None = None,
                            seed: int = 0, resume: bool = False) -> dict:
    """Force-reg annealing fine-tune of a converged config-3 run (see
    run_smoke_indirect_ft / experiments/smoke3d.py for the method)."""
    pde, train, val = _shape_transition_setup(size, n, num_train, num_val,
                                              datadir)
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            e2e_iterations=e2e_iterations or 600,
                            e2e_lr=5e-5, grad_clip=1.0,
                            force_reg=force_reg, seed=seed)
    return finetune_e2e(pde, ccfg, train, val, workdir, init_from,
                        mesh=mesh, resume=resume)


def run_shape_transition_rings_ft(workdir: str, init_from: str,
                                  ring_fraction: float = 0.25,
                                  size: int = 64, n: int = 16,
                                  num_train: int = 256, num_val: int = 32,
                                  batch_size: int = 8,
                                  e2e_iterations: int | None = None,
                                  mesh=None, seed: int = 0,
                                  resume: bool = False) -> dict:
    """Rings-OOD mitigation (VERDICT r4 item 4): fine-tune a converged
    config-3 controller on a MIXED dataset — the original circles/boxes
    family plus a `ring_fraction` share of annulus (hollow-topology)
    targets — at the training force_reg (this is a data treatment, not a
    reg anneal). The hypothesis under test: the 7× rings degradation
    (13.5× vs 99× in-dist, runs/generalize_shapes) is missing training
    coverage, not an architecture limit; re-run generalize_shapes with
    this entry's ckpt_final to measure all three families after."""
    from pde_control_tpu.data.generate import generate_forced_smoke_dataset
    from pde_control_tpu.data.scene import concat_datasets

    domain = Domain2D.create(size, size)
    cfg = FluidConfig(dt=1.0, buoyancy=0.0, pressure_tol=1e-4,
                      pressure_maxiter=200, warm_start_pressure=True)
    n_rings = max(int(num_train * ring_fraction), 1)
    # Shapes share the base run's generation seed (same distribution);
    # ring seeds are disjoint from generalize_shapes' eval seed (2999).
    train = concat_datasets(
        generate_forced_smoke_dataset(domain, cfg, num_train - n_rings, n,
                                      seed=0, init="shapes"),
        generate_forced_smoke_dataset(domain, cfg, n_rings, n,
                                      seed=7777, init="rings"))
    val = generate_forced_smoke_dataset(domain, cfg, num_val, n,
                                        seed=999, init="shapes")
    pde = IncompressibleFluidPDE(domain, cfg, control="direct",
                                 unet_levels=3 if size >= 32 else 2)
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            e2e_iterations=e2e_iterations or 600,
                            e2e_lr=5e-5, grad_clip=1.0,
                            force_reg=1e-5, seed=seed)
    results = finetune_e2e(pde, ccfg, train, val, workdir, init_from,
                           mesh=mesh, resume=resume)
    results["ring_fraction"] = ring_fraction
    import json
    import os

    with open(os.path.join(workdir, "results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results


def _smoke_indirect_setup(size: int, n: int, num_train: int, num_val: int,
                          control_amplitude: float,
                          datadir: str | None, width: int = 1):
    """The indirect-smoke task's (pde, train, val) — shared by the main
    curriculum (config 4 at 64², the 128² stretch) and the fine-tune
    entry so both train on the SAME task and datasets (same generation
    seeds, same disk-cache keys).

    width: net-width multiplier (MXU-fill operating point, round 4 —
    scripts/ab_width.py: width 2 = 4x the net FLOPs at +27% iteration
    wall-clock on v5e). Datasets/physics are width-independent, so wide
    and narrow runs share the same --datadir cache."""
    obstacles = default_obstacles(size, size)
    domain = Domain2D.create(size, size, obstacle_mask=jnp.asarray(obstacles))
    cfg = FluidConfig(dt=1.0, buoyancy=0.08, pressure_tol=1e-4,
                      pressure_maxiter=200, warm_start_pressure=True)
    base = dict(task="smoke_indirect", size=size, n=n,
                control_amplitude=control_amplitude,
                physics=_physics_key(cfg))
    train = _maybe_cached(
        datadir, "train", dict(base, num=num_train, seed=0),
        lambda: generate_inflow_smoke_dataset(
            domain, cfg, num_train, n, seed=0,
            control_amplitude=control_amplitude))
    val = _maybe_cached(
        datadir, "val", dict(base, num=num_val, seed=999),
        lambda: generate_inflow_smoke_dataset(
            domain, cfg, num_val, n, seed=999,
            control_amplitude=control_amplitude))
    pde = IncompressibleFluidPDE(
        domain, cfg, control="buoyancy", with_inflow=True,
        unet_levels=3 if size >= 32 else 2,
        cfe_features=tuple(width * f for f in (48, 96, 96, 48)),
        op_base_features=16 * width)
    return pde, train, val


def run_smoke_indirect(workdir: str, size: int = 64, n: int = 16,
                       iterations: int = 500, num_train: int = 256,
                       num_val: int = 32, batch_size: int = 8,
                       control_amplitude: float = 1.0,
                       e2e_iterations: int | None = None,
                       mesh=None, datadir: str | None = None,
                       seed: int = 0, resume: bool = False,
                       width: int = 1, lr_scale: float = 1.0) -> dict:
    """Config 4: indirect smoke control — inflow-driven plume through an
    obstacle course, buoyancy-only forcing, targets from withheld control.

    `control_amplitude` scales the withheld buoyancy-modulation field: it
    sets how far targets deviate from natural evolution (the zero-force
    baseline MSE), i.e. how much signal the controller must supply.
    `width` multiplies all net widths (the round-4 MXU-fill Pareto run).
    `lr_scale` multiplies every stage LR — the batch-scaling protocol
    (batch 8→64 at matched sample budget uses sqrt(8)≈2.83)."""
    pde, train, val = _smoke_indirect_setup(size, n, num_train, num_val,
                                            control_amplitude, datadir,
                                            width=width)
    # grad_clip + e2e_lr 1e-4: the wider CFE diverged catastrophically in
    # e2e at lr 3e-4 unclipped (force cost blew up to 1e24 in the 4000-iter
    # r2 run) — long-horizon solver-in-the-loop gradients need the clip.
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            cfe_iterations=iterations,
                            op_iterations=iterations,
                            e2e_iterations=e2e_iterations or iterations,
                            cfe_lr=1e-3 * lr_scale, op_lr=1e-3 * lr_scale,
                            e2e_lr=1e-4 * lr_scale, grad_clip=1.0,
                            force_reg=3e-5, seed=seed)
    return run_curriculum(pde, ccfg, train, val, workdir, mesh=mesh,
                          resume=resume)


def run_smoke_indirect_ft(workdir: str, init_from: str,
                          force_reg: float = 1.5e-5,
                          size: int = 64, n: int = 16,
                          num_train: int = 256, num_val: int = 32,
                          batch_size: int = 8,
                          control_amplitude: float = 1.0,
                          e2e_iterations: int | None = None,
                          mesh=None, datadir: str | None = None,
                          seed: int = 0, resume: bool = False) -> dict:
    """Force-reg annealing fine-tune of a converged smoke-indirect run
    (64² config 4 or the 128² stretch — `size` selects; the task setup is
    shared with run_smoke_indirect so datasets are identical). See
    experiments/smoke3d.py::run_smoke3d_indirect_ft for the rationale:
    at the converged force_reg the reg term is ~half the loss and caps
    observation quality; annealing from the converged checkpoint buys MSE
    without the from-scratch low-reg divergence risk."""
    pde, train, val = _smoke_indirect_setup(size, n, num_train, num_val,
                                            control_amplitude, datadir)
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            e2e_iterations=e2e_iterations or 600,
                            e2e_lr=5e-5, grad_clip=1.0,
                            force_reg=force_reg, seed=seed)
    return finetune_e2e(pde, ccfg, train, val, workdir, init_from,
                        mesh=mesh, resume=resume)


def _natural_flow_setup(size: int, n: int, num_train: int, num_val: int,
                        datadir: str | None):
    """Config 5's (pde, train, val) — shared by the main curriculum and
    the fine-tune entry (same generation seeds, same disk-cache keys)."""
    domain = Domain2D.create(size, size)
    cfg = FluidConfig(dt=0.5, buoyancy=0.05, pressure_tol=1e-4,
                      pressure_maxiter=200, warm_start_pressure=True)
    base = dict(task="natural_flow", size=size, n=n, init="blobs",
                physics=_physics_key(cfg),
                force_amplitude=0.05, dt=0.5)
    train = _maybe_cached(
        datadir, "train", dict(base, num=num_train, seed=0),
        lambda: generate_forced_smoke_dataset(
            domain, cfg, num_train, n, seed=0, init="blobs",
            force_amplitude=0.05))
    val = _maybe_cached(
        datadir, "val", dict(base, num=num_val, seed=999),
        lambda: generate_forced_smoke_dataset(
            domain, cfg, num_val, n, seed=999, init="blobs",
            force_amplitude=0.05))
    pde = IncompressibleFluidPDE(domain, cfg, control="direct",
                                 unet_levels=3)
    return pde, train, val


def run_natural_flow_128_ft(workdir: str, init_from: str,
                            force_reg: float = 5e-6,
                            size: int = 64, n: int = 128,
                            num_train: int = 128, num_val: int = 16,
                            batch_size: int = 8,
                            e2e_iterations: int | None = None,
                            mesh=None, datadir: str | None = None,
                            seed: int = 0, resume: bool = False) -> dict:
    """Force-reg annealing fine-tune of a converged config-5 run. Keeps
    the base run's dense obs supervision (frames 32/64/96/128 — needed
    for long-horizon gradient stability) and staged-training hygiene
    (grad clip, low LR); only the reg anneals. Config 5's converged reg
    share is smaller (~13%) than the indirect tasks', so the expected
    gain is correspondingly smaller — the fresh cosine LR cycle is part
    of the treatment."""
    pde, train, val = _natural_flow_setup(size, n, num_train, num_val,
                                          datadir)
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            e2e_iterations=e2e_iterations or 2000,
                            e2e_lr=5e-5, grad_clip=1.0,
                            e2e_obs_frames=tuple(
                                f for f in (32, 64, 96) if f < n) + (n,),
                            force_reg=force_reg, seed=seed)
    return finetune_e2e(pde, ccfg, train, val, workdir, init_from,
                        mesh=mesh, resume=resume)


def run_natural_flow_128(workdir: str, size: int = 64, n: int = 128,
                         iterations: int = 300, num_train: int = 128,
                         num_val: int = 16, batch_size: int = 8,
                         e2e_iterations: int | None = None,
                         mesh=None, datadir: str | None = None,
                         seed: int = 0, resume: bool = False,
                         sequence: str = "staggered") -> dict:
    """Config 5: batched 128-step forced-flow reconstruction, DP mesh —
    buoyant plumes under withheld random forcing (zero force can't match).

    `sequence` selects the e2e scheme: 'staggered' (the protocol default)
    or 'refined' — viable at n=128 only via the scan-based builder
    (control/sequences.py::run_refined_scan; the unrolled recursion never
    finished compiling there)."""
    pde, train, val = _natural_flow_setup(size, n, num_train, num_val,
                                          datadir)
    # e2e at n=128 diverged at lr 3e-4 in r2's first pass (loss 1.7e-2 →
    # 2.8e-2 over 300 iters); staged horizon growth + a lower LR keeps the
    # long-rollout gradients in the stable regime.
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            cfe_iterations=iterations,
                            op_iterations=iterations,
                            e2e_iterations=e2e_iterations or iterations,
                            e2e_sequence=sequence,
                            e2e_lr=1e-4,
                            e2e_stage_ns=tuple(
                                s for s in (32, 64) if s < n) + (n,),
                            e2e_obs_frames=tuple(
                                f for f in (32, 64, 96) if f < n) + (n,),
                            force_reg=1e-5, grad_clip=1.0, seed=seed)
    return run_curriculum(pde, ccfg, train, val, workdir, mesh=mesh,
                          resume=resume)
