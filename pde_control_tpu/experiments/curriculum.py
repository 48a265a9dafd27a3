"""The staged training curriculum (SURVEY.md §3.4) as a reusable runner.

Stages, exactly as the reference composes them via per-network checkpoints:
  1. CFE supervised — chain sequence against ground-truth next frames.
  2. OPk supervised — per hierarchy level, dataset triples, no solver.
  3. End-to-end — staggered (or refined) sequence, all networks trainable,
     restoring stages 1-2; optional staged growth of n.
  4. Eval — infer_all_frames on validation → final-state MSE + mean force.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from pde_control_tpu.control.pde_base import PDE
from pde_control_tpu.control.training import ControlTraining


@dataclasses.dataclass
class CurriculumConfig:
    n: int
    batch_size: int = 16
    cfe_iterations: int = 1000
    op_iterations: int = 1000
    e2e_iterations: int = 1000
    cfe_lr: float = 1e-3
    op_lr: float = 1e-3
    e2e_lr: float = 3e-4
    force_reg: float = 1e-3
    e2e_sequence: str = "staggered"  # or 'refined'
    # Staged horizon growth for stage 3 (reference §3.4: "optionally staged
    # n: 8→16→…→n"); None = train at full n directly.
    e2e_stage_ns: tuple | None = None
    # Global-norm gradient clip. Defaults ON: every unclipped
    # solver-in-the-loop e2e stage observed in round 2 eventually diverged
    # (force costs blew up to 1e12-1e24); None opts out.
    grad_clip: float | None = 1.0
    seed: int = 0
    # Optimizer steps fused per device dispatch (train(steps_per_call=k)) —
    # each separate dispatch costs ~7 ms over the axon tunnel.
    steps_per_call: int = 8
    # LR schedule for the e2e stage ('cosine' decays over the stage's
    # iteration count); supervised stages keep a constant LR.
    e2e_lr_schedule: str | None = "cosine"
    # Mid-stage crash recovery: every `autosave_every` optimizer steps the
    # stage autosaves its full training state; run_curriculum(resume=True)
    # restores it and finishes the interrupted stage (round 3 — a tunnel
    # outage SIGTERM'd a 2-hour run mid-stage). 0 disables.
    autosave_every: int = 500
    # Observation-loss frames for the e2e stage. None = final frame only
    # (the paper's loss). A tuple adds intermediate ground-truth frames as
    # auxiliary losses (the reference's obs_loss_frames supports this) —
    # denser supervision stabilizes long-horizon (n≥64) training; frames
    # beyond the current staged horizon n_k are dropped, n_k always kept.
    e2e_obs_frames: tuple | None = None


def op_spans(n: int) -> list[int]:
    out = []
    while n >= 2:
        out.append(n)
        n //= 2
    return out


def _ckpt_has(ckpt_dir: str, *names: str) -> bool:
    """True when `ckpt_dir` holds a msgpack for every named network."""
    return all(os.path.exists(os.path.join(ckpt_dir, f"{n}.msgpack"))
               for n in names)


def autosave_kwargs(workdir: str, tag: str, every: int,
                    restore: bool) -> dict:
    """train() kwargs for mid-stage crash recovery (shared by the
    curriculum and the scheme comparisons): autosave the full training
    state every `every` steps; restore an existing autosave when
    resuming. 0 disables."""
    if not every:
        return {}
    return dict(autosave_dir=os.path.join(workdir, f"autosave_{tag}"),
                autosave_every=every, autosave_restore=restore)


def clear_autosave(workdir: str, tag: str) -> None:
    """Drop a stage's autosave (and any swap leftovers) once the stage
    checkpoint is safely written — and also when a resumed run SKIPS the
    stage: a stale autosave surviving a skip would be silently restored
    if the user later deletes the stage checkpoint to force a retrain."""
    import shutil

    for suffix in ("", ".old", ".tmp"):
        shutil.rmtree(os.path.join(workdir, f"autosave_{tag}{suffix}"),
                      ignore_errors=True)


def run_curriculum(
    pde: PDE,
    cfg: CurriculumConfig,
    dataset,
    val_dataset,
    workdir: str,
    mesh=None,
    skip_cfe: bool = False,
    resume: bool = False,
) -> dict:
    if cfg.e2e_stage_ns and cfg.e2e_stage_ns[-1] != cfg.n:
        raise ValueError(
            f"e2e_stage_ns must end at n={cfg.n} (got {cfg.e2e_stage_ns}) — "
            "the final eval compares frame n of the last-stage model")
    os.makedirs(workdir, exist_ok=True)
    results: dict = {}

    def stage_dir(name: str) -> str:
        return os.path.join(workdir, name)

    common = dict(pde=pde, dataset=dataset, val_dataset=val_dataset,
                  batch_size=cfg.batch_size, mesh=mesh,
                  force_reg=cfg.force_reg, grad_clip=cfg.grad_clip,
                  seed=cfg.seed)

    def autosave_kw(tag: str) -> dict:
        return autosave_kwargs(workdir, tag, cfg.autosave_every, resume)

    def drop_autosave(tag: str) -> None:
        clear_autosave(workdir, tag)

    # With `resume`, stages whose checkpoint already exists in `workdir` are
    # skipped (their results entry records {"resumed": True}) — restarting a
    # killed multi-hour curriculum re-pays only the interrupted stage. This
    # mirrors the reference workflow, where each stage is a separate script
    # invocation composing through per-network checkpoints (SURVEY §3.4).
    # ---- stage 1: CFE supervised (chain, all-frames loss) -------------------
    cfe_done = (resume and not skip_cfe
                and _ckpt_has(stage_dir("ckpt_cfe"), "CFE"))
    if cfe_done:
        results["cfe_supervised"] = {"resumed": True}
        drop_autosave("cfe")
    if not skip_cfe and not cfe_done:
        app = ControlTraining(
            cfg.n, trainable_networks=("CFE",), sequence_class="chain",
            obs_loss_frames=tuple(range(1, cfg.n + 1)),
            learning_rate=cfg.cfe_lr,
            logdir=stage_dir("logs_cfe"), **common,
        ).prepare()
        results["cfe_supervised"] = app.train(
            cfg.cfe_iterations, steps_per_call=cfg.steps_per_call,
            **autosave_kw("cfe"))
        app.save(stage_dir("ckpt_cfe"))
        drop_autosave("cfe")

    # ---- stage 2: per-level OP supervised -----------------------------------
    for span in sorted(op_spans(cfg.n)):
        if resume and _ckpt_has(stage_dir("ckpt_ops"), f"OP{span}"):
            results[f"op{span}_supervised"] = {"resumed": True}
            drop_autosave(f"op{span}")
            continue
        app = ControlTraining(
            cfg.n, trainable_networks=(f"OP{span}",),
            sequence_class="op_supervised", learning_rate=cfg.op_lr,
            restore=stage_dir("ckpt_ops") if span > 2 and
            os.path.isdir(stage_dir("ckpt_ops")) else None,
            logdir=stage_dir(f"logs_op{span}"), **common,
        ).prepare()
        results[f"op{span}_supervised"] = app.train(
            cfg.op_iterations, steps_per_call=cfg.steps_per_call,
            **autosave_kw(f"op{span}"))
        # Save ONLY this stage's trained net into the shared ckpt_ops dir:
        # saving all nets would also write the LATER spans at random init,
        # and the resume skip above (`_ckpt_has(ckpt_ops, f"OP{span}")`)
        # would mistake them for completed stages (round-3 bug: every
        # --resume-from-scratch run silently skipped OP pretraining past
        # the first span).
        app.save(stage_dir("ckpt_ops"), names=(f"OP{span}",))
        drop_autosave(f"op{span}")

    # ---- stage 3: end-to-end (optionally staged horizon growth) -----------
    stage_ns = tuple(cfg.e2e_stage_ns) if cfg.e2e_stage_ns else (cfg.n,)
    prev_ckpt = None
    for n_k in stage_ns:
        ck = stage_dir(f"ckpt_e2e_n{n_k}")
        stage_done = (resume and _ckpt_has(
            ck, "CFE", *(f"OP{s}" for s in op_spans(n_k))))
        if stage_done:
            results[f"end_to_end_n{n_k}"] = {"resumed": True}
            drop_autosave(f"e2e_n{n_k}")
            prev_ckpt = ck
            if n_k != stage_ns[-1]:
                continue
            # Final stage already trained: still build the app (restored
            # from its own checkpoint) — stage 4's eval needs it.
        # Each network restores from the newest checkpoint that has it:
        # the previous horizon's refined nets when available, else the
        # supervised stage-1/2 checkpoints (a larger n_k introduces a new
        # top-level OP{n_k} that only exists in ckpt_ops).
        restore = {}
        if not skip_cfe or prev_ckpt:
            restore["CFE"] = prev_ckpt or stage_dir("ckpt_cfe")
        for span in op_spans(n_k):
            name = f"OP{span}"
            if prev_ckpt and os.path.exists(
                    os.path.join(prev_ckpt, f"{name}.msgpack")):
                restore[name] = prev_ckpt
            else:
                restore[name] = stage_dir("ckpt_ops")
        trainable = ("CFE",) + tuple(f"OP{s}" for s in op_spans(n_k))
        if cfg.e2e_obs_frames:
            frames = tuple(sorted({f for f in cfg.e2e_obs_frames
                                   if f < n_k} | {n_k}))
        else:
            frames = (n_k,)
        app = ControlTraining(
            n_k, trainable_networks=trainable,
            sequence_class=cfg.e2e_sequence, obs_loss_frames=frames,
            learning_rate=cfg.e2e_lr, restore=restore,
            lr_schedule=cfg.e2e_lr_schedule,
            decay_steps=cfg.e2e_iterations if cfg.e2e_lr_schedule else None,
            logdir=stage_dir(f"logs_e2e_n{n_k}"), **common,
        ).prepare()
        if not stage_done:
            results[f"end_to_end_n{n_k}"] = app.train(
                cfg.e2e_iterations, steps_per_call=cfg.steps_per_call,
                **autosave_kw(f"e2e_n{n_k}"))
            prev_ckpt = ck
            app.save(prev_ckpt)
            drop_autosave(f"e2e_n{n_k}")
    results["end_to_end"] = results[f"end_to_end_n{stage_ns[-1]}"]
    app.save(stage_dir("ckpt_final"))

    # ---- stage 4: eval ------------------------------------------------------
    results["eval"] = evaluate_control(app, val_dataset, cfg.n,
                                       render_dir=workdir)
    from pde_control_tpu.utils.epoch import stamp

    stamp(results)  # VM/dataset epoch: cross-reset MSEs compare by ratio only
    with open(os.path.join(workdir, "results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results


def finetune_e2e(
    pde: PDE,
    cfg: CurriculumConfig,
    dataset,
    val_dataset,
    workdir: str,
    init_ckpt: str,
    mesh=None,
    resume: bool = False,
) -> dict:
    """One extra end-to-end stage on top of a FINISHED curriculum run.

    Restores every network (CFE + all OP spans of cfg.n) from
    `init_ckpt` — typically another run's `ckpt_final` — and trains them
    jointly at THIS config's force_reg/lr. The use case is force-reg
    annealing (reference §3.4 staged-training analog: stages compose
    through checkpoints): the converged loss is typically ~half force-reg
    term (round-2 invariant), so lowering the reg from an already-stable
    controller buys observation accuracy without the from-scratch
    divergence risk documented in experiments/smoke3d.py.

    Same crash-recovery contract as run_curriculum: `resume` skips the
    stage when `ckpt_final` already exists and restores mid-stage
    autosaves otherwise. Writes results.json with the standard eval block.
    """
    needed = ("CFE",) + tuple(f"OP{s}" for s in op_spans(cfg.n))
    if not _ckpt_has(init_ckpt, *needed):
        raise FileNotFoundError(
            f"init_ckpt {init_ckpt!r} is missing one of {needed} — "
            "point --init-from at a finished run's ckpt_final")
    os.makedirs(workdir, exist_ok=True)
    results: dict = {"init_ckpt": init_ckpt, "force_reg": cfg.force_reg}
    ck = os.path.join(workdir, "ckpt_final")
    stage_done = resume and _ckpt_has(ck, *needed)
    if cfg.e2e_obs_frames:  # keep the base run's dense supervision
        frames = tuple(sorted({f for f in cfg.e2e_obs_frames
                               if f < cfg.n} | {cfg.n}))
    else:
        frames = (cfg.n,)
    app = ControlTraining(
        cfg.n, trainable_networks=needed,
        sequence_class=cfg.e2e_sequence, obs_loss_frames=frames,
        learning_rate=cfg.e2e_lr,
        restore={name: (ck if stage_done else init_ckpt) for name in needed},
        lr_schedule=cfg.e2e_lr_schedule,
        decay_steps=cfg.e2e_iterations if cfg.e2e_lr_schedule else None,
        logdir=os.path.join(workdir, "logs_ft"),
        pde=pde, dataset=dataset, val_dataset=val_dataset,
        batch_size=cfg.batch_size, mesh=mesh, force_reg=cfg.force_reg,
        grad_clip=cfg.grad_clip, seed=cfg.seed,
    ).prepare()
    if stage_done:
        results["finetune"] = {"resumed": True}
        clear_autosave(workdir, "ft")
    else:
        results["finetune"] = app.train(
            cfg.e2e_iterations, steps_per_call=cfg.steps_per_call,
            **autosave_kwargs(workdir, "ft", cfg.autosave_every, resume))
        app.save(ck)
        clear_autosave(workdir, "ft")
    results["eval"] = evaluate_control(app, val_dataset, cfg.n,
                                       render_dir=workdir)
    from pde_control_tpu.utils.epoch import stamp

    stamp(results)
    with open(os.path.join(workdir, "results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results


def zero_force_baseline(app: ControlTraining, batch,
                        all_frames: bool = False) -> np.ndarray:
    """Observation(s) of the UNCONTROLLED rollout from the same initial
    state — the degenerate 'controller' every result must beat. If the task
    is well-posed (target ≠ natural evolution), this baseline's MSE is large
    and the controlled MSE must be far below it (VERDICT r1 items 2, 7).
    Returns the final observation, or the full (n, B, *s, C) trajectory
    with all_frames (per-frame error curves)."""
    import jax
    from jax import lax

    pde = app.pde

    # Cache the jitted rollout on the app: the chunked eval loop calls
    # this per chunk, and a fresh closure per call would defeat jit's
    # cache and re-trace the identical scan n_chunks times (round-3 fix).
    cache = getattr(app, "_zero_force_jits", None)
    if cache is None:
        cache = app._zero_force_jits = {}
    if all_frames not in cache:

        @jax.jit
        def natural(batch, _all_frames=all_frames):
            state0 = pde.initial_state(batch)

            def body(s, _):
                s2 = pde.step(s, None)
                return s2, pde.observe(s2) if _all_frames else None

            final, obs = lax.scan(body, state0, None, length=app.n)
            return obs if _all_frames else pde.observe(final)

        cache[all_frames] = natural

    return np.asarray(cache[all_frames](batch))


def evaluate_control(app: ControlTraining, val_dataset, n: int,
                     render_dir: str | None = None,
                     eval_batch: int = 16, render_samples: int = 4) -> dict:
    """Final-state MSE vs ground truth, mean |F| (the paper's force metric),
    force cost, and the zero-force baseline MSE (§3.5 metrics).

    Statistically robust protocol (VERDICT r2 item 4 / reference
    infer_all_frames over whole val ranges [R], SURVEY §3.5): evaluates the
    ENTIRE validation set in deterministic `eval_batch`-sized chunks (one
    compiled program reused across chunks; a sub-size tail is dropped, with
    the evaluated count reported), reports the per-sample spread of the
    final MSE, and per-frame error curves for both the controlled and the
    zero-force rollout."""
    if n != app.n:
        raise ValueError(f"eval n={n} != model horizon {app.n}")
    import jax

    num = len(val_dataset)
    eval_batch = min(eval_batch, num)
    n_chunks = max(num // eval_batch, 1)
    per_sample_mse = []          # (num,) final-frame MSE per trajectory
    per_sample_zero_mse = []
    frame_sse = np.zeros(n)      # summed per-frame squared error
    frame_sse_zero = np.zeros(n)
    frame_count = 0
    cost_sums = []
    absf_means = []
    first_chunk = None
    for c in range(n_chunks):
        idx = np.arange(c * eval_batch, (c + 1) * eval_batch)
        batch = val_dataset.take(idx)
        obs_traj, costs, _final, forces = app.infer_all_frames(
            batch, keep_forces=True)
        obs_traj = np.asarray(obs_traj)            # (n, B, *s, C)
        gt = np.asarray(batch["obs"])              # (B, n+1, *s, C)
        natural = zero_force_baseline(app, batch, all_frames=True)
        sp_axes = tuple(range(1, gt.ndim - 1))     # spatial+channel of (B,…)
        err = obs_traj - np.moveaxis(gt[:, 1:n + 1], 1, 0)
        err_zero = natural - np.moveaxis(gt[:, 1:n + 1], 1, 0)
        per_sample_mse.append(np.mean(err[n - 1] ** 2, axis=sp_axes))
        per_sample_zero_mse.append(
            np.mean(err_zero[n - 1] ** 2, axis=sp_axes))
        # err is (n, B, *spatial, C): average the spatial/channel axes
        # (from 2), then SUM over batch axis 1 so frame_sse/frame_count is
        # the per-frame mean. (Round-3 fix: sp_axes — valid for the
        # batch-leading err[n-1] — was applied here too, averaging over
        # batch and re-dividing by frame_count: curves came out
        # eval_batch× too small. per_frame_mse[-1] must equal
        # final_state_mse; tests/test_curriculum.py pins this.)
        fr_axes = tuple(range(2, err.ndim))
        frame_sse += np.sum(np.mean(err ** 2, axis=fr_axes), axis=1)
        frame_sse_zero += np.sum(np.mean(err_zero ** 2, axis=fr_axes),
                                 axis=1)
        frame_count += err.shape[1]
        cost_sums.append(np.sum(np.asarray(costs), axis=0))
        absf_means.append(np.asarray(
            jax.vmap(app.pde.force_abs_mean)(forces)))
        if first_chunk is None:
            first_chunk = (obs_traj, gt, natural)
    per_sample_mse = np.concatenate(per_sample_mse)
    per_sample_zero_mse = np.concatenate(per_sample_zero_mse)
    out = {
        "final_state_mse": float(np.mean(per_sample_mse)),
        "final_state_mse_std": float(np.std(per_sample_mse)),
        "final_state_mse_sem": float(
            np.std(per_sample_mse) / np.sqrt(len(per_sample_mse))),
        "mean_force_cost": float(np.mean(np.concatenate(cost_sums))),
        "mean_abs_force": float(np.mean(np.concatenate(absf_means, axis=1))),
        "zero_force_final_mse": float(np.mean(per_sample_zero_mse)),
        "zero_force_final_mse_std": float(np.std(per_sample_zero_mse)),
        "eval_samples": int(frame_count),
        "val_set_size": int(num),
        "per_frame_mse": (frame_sse / frame_count).tolist(),
        "per_frame_zero_force_mse": (frame_sse_zero / frame_count).tolist(),
    }
    obs_traj, gt, natural = first_chunk
    if render_dir and obs_traj.ndim in (5, 6) and obs_traj.shape[2] > 1:
        # 2D fields render directly; 3D volumes render their mid-depth
        # slice (the viz helpers slice internally). Render `render_samples`
        # validation trajectories, not just sample 0 (VERDICT r2 weak #7).
        from pde_control_tpu.utils.viz import save_comparison_png, save_field_png

        for s in range(min(render_samples, obs_traj.shape[1])):
            save_comparison_png(
                {"controlled final": obs_traj[n - 1, s, ..., 0],
                 "target": gt[s, n, ..., 0],
                 "zero force": natural[n - 1, s, ..., 0]},
                os.path.join(render_dir, f"eval_sample{s}.png"))
        for tag, field in [("controlled_final", obs_traj[n - 1, 0, ..., 0]),
                           ("target", gt[0, n, ..., 0]),
                           ("zero_force_final", natural[n - 1, 0, ..., 0])]:
            save_field_png(field, os.path.join(render_dir, f"eval_{tag}.png"),
                           title=tag)
    return out
