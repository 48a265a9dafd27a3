"""ControlTraining — the staged training harness (THE entry point).

Rebuild of `src/control/control_training.py :: ControlTraining` +
`phi/tf/model.py :: LearningApp` [R] (SURVEY.md §2a, §3.2-3.4). The
reference builds one static TF1 graph of the whole unrolled sequence and
trains it under a session; here the same composition is a pure
`loss(params, batch)` traced once by `jax.jit`.

Staging model (matches the reference curriculum, §3.4):
  * networks are named 'CFE', 'OP2', 'OP4', … 'OPn' (reference naming);
  * `trainable_networks` masks the optimizer (optax.multi_transform) so a
    stage updates only its subset while the rest stay frozen;
  * stages communicate only through per-network checkpoints
    (utils.checkpoint), like the reference's per-scope tf.train.Saver.

Sequence classes: 'chain' (supervised next-frame targets), 'chain_final'
(greedy: final target every step), 'staggered', 'refined', and
'op_supervised' (per-level OP pretraining on dataset triples — no solver).
"""

from __future__ import annotations

import os
import time
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pde_control_tpu.control.pde_base import PDE
from pde_control_tpu.control.sequences import (
    run_chain,
    run_refined,
    run_refined_scan,
    staggered_targets,
)
from pde_control_tpu.parallel.mesh import replicate, shard_batch
from pde_control_tpu.utils.checkpoint import restore_networks, save_networks
from pde_control_tpu.utils.logging import MetricsLogger

SEQUENCE_CLASSES = ("chain", "chain_final", "staggered", "refined",
                    "op_supervised")


def _time_major(obs: jnp.ndarray) -> jnp.ndarray:
    """(B, T, *s, C) → (T, B, *s, C)."""
    return jnp.moveaxis(obs, 1, 0)


class ControlTraining:
    def __init__(
        self,
        n: int,
        pde: PDE,
        dataset=None,
        val_dataset=None,
        batch_size: int = 16,
        trainable_networks: Sequence[str] = ("CFE",),
        sequence_class: str = "staggered",
        obs_loss_frames: Sequence[int] | None = None,
        force_reg: float = 1e-2,
        learning_rate: float = 1e-3,
        restore: dict[str, str] | str | None = None,
        seed: int = 0,
        remat=True,  # True (whole-body + saved pressure, fastest & smallest)
        # | 'selective' (net-only) | False — measured in control/sequences.py.
        scan_unroll: int = 1,  # lax.scan unroll factor for chain rollouts
        # (XLA may fuse across steps; A/B'd in scripts/ab_unroll.py).
        logdir: str | None = None,
        mesh=None,
        grad_clip: float | None = None,
        lr_schedule: str | None = None,  # None | 'cosine'
        decay_steps: int | None = None,  # cosine horizon = planned iterations
        # Skip (don't apply) any update whose gradients contain NaN/Inf
        # (optax.apply_if_finite) instead of poisoning the params — one bad
        # batch or a transient solver blow-up then costs one step, not the
        # whole run (round 3: a CFE stage hit a single non-finite step and
        # every later stage trained on NaN params for hours). The train
        # loop aborts the stage with RuntimeError once
        # `divergence_abort` CONSECUTIVE steps were non-finite (persistent
        # divergence — fail fast instead of stalling). None disables both.
        skip_nonfinite: bool = True,
        divergence_abort: int = 200,
        # Refined-sequence builder: 'unrolled' (run_refined — O(n) program,
        # never finished compiling at n=128, rc=124), 'scan'
        # (run_refined_scan — O(log n) program, same math, pinned equal),
        # or 'auto' (scan from n>=32, where unrolled compile cost starts to
        # dominate; unrolled below — marginally faster steps, historical
        # checkpoints trained with it).
        refined_impl: str = "auto",
    ):
        if sequence_class not in SEQUENCE_CLASSES:
            raise ValueError(f"unknown sequence_class {sequence_class!r}")
        if (n >= 2 and n & (n - 1)
                and sequence_class in ("staggered", "refined",
                                       "op_supervised")):
            # Only binary time-axis subdivision needs 2^k; the greedy
            # chains train on any horizon.
            raise ValueError(
                f"n must be a power of two for {sequence_class!r}, got {n}")
        if mesh is not None and batch_size % mesh.devices.size != 0:
            raise ValueError(
                f"batch_size={batch_size} must be divisible by the mesh size "
                f"({mesh.devices.size} devices) for data-parallel sharding")
        self.n = n
        self.pde = pde
        self.dataset = dataset
        self.val_dataset = val_dataset
        self.batch_size = batch_size
        self.sequence_class = sequence_class
        self.trainable_networks = tuple(trainable_networks)
        self.obs_loss_frames = tuple(obs_loss_frames) if obs_loss_frames else (n,)
        bad = [f for f in self.obs_loss_frames if not 1 <= f <= n]
        if bad:
            # f=0 would silently read obs_traj[-1] (the FINAL frame)
            # against gt frame 0 — a nonsensical loss term.
            raise ValueError(
                f"obs_loss_frames must be within 1..n={n}, got {bad}")
        self.force_reg = force_reg
        self.learning_rate = learning_rate
        self.restore = restore
        self.grad_clip = grad_clip
        self.lr_schedule = lr_schedule
        if lr_schedule == "cosine" and not decay_steps:
            raise ValueError(
                "lr_schedule='cosine' needs decay_steps (the stage's planned "
                "iteration count) — a fixed horizon silently disables decay "
                "for typical 300-2000-iter stages")
        self.decay_steps = decay_steps
        self.skip_nonfinite = skip_nonfinite
        self.divergence_abort = divergence_abort
        self.seed = seed
        self.remat = remat
        self.scan_unroll = scan_unroll
        if refined_impl not in ("auto", "scan", "unrolled"):
            raise ValueError(f"unknown refined_impl {refined_impl!r}")
        self.refined_impl = ("scan" if n >= 32 else "unrolled") \
            if refined_impl == "auto" else refined_impl
        self.mesh = mesh
        self.logger = MetricsLogger(logdir)
        self._prepared = False

        # Which OP levels exist: spans n, n/2, …, 2.
        self.op_spans: list[int] = []
        if sequence_class in ("staggered", "refined", "op_supervised"):
            span = n
            while span >= 2:
                self.op_spans.append(span)
                span //= 2

    # ------------------------------------------------------------ lifecycle

    def prepare(self) -> "ControlTraining":
        """Init nets + optimizer; restore checkpoints. (Reference: graph
        build + Session init + Saver restore, §3.2.)"""
        # Keep trajectory data device-resident: sampling becomes an
        # on-device gather, so the train loop never streams batch arrays
        # over the (slow) host→device link (data/scene.py::DeviceDataset).
        from pde_control_tpu.data.scene import DeviceDataset

        if self.dataset is not None:
            self.dataset = DeviceDataset.wrap(self.dataset)
        if self.val_dataset is not None:
            self.val_dataset = DeviceDataset.wrap(self.val_dataset)
        pde = self.pde
        rng = jax.random.PRNGKey(self.seed)
        self.cfe = pde.build_cfe()
        self.ops = {span: pde.build_op() for span in self.op_spans}

        ex_state = pde.example_state(1)
        ex_obs = pde.observe(ex_state)
        params: dict[str, Any] = {}
        rng, key = jax.random.split(rng)
        params["CFE"] = self.cfe.init(key, pde.cfe_inputs(ex_state, ex_obs))[
            "params"
        ]
        for span, op in self.ops.items():
            rng, key = jax.random.split(rng)
            params[f"OP{span}"] = op.init(key, pde.op_inputs(ex_obs, ex_obs))[
                "params"
            ]

        if isinstance(self.restore, str):
            # A checkpoint directory: restore every network present in it.
            params = restore_networks(self.restore, params)
        elif isinstance(self.restore, dict):
            # Per-network paths (dir or .msgpack file) — how stages compose.
            import os

            from pde_control_tpu.utils.checkpoint import load_network

            for name, path in self.restore.items():
                if os.path.isdir(path):
                    path = os.path.join(path, f"{name}.msgpack")
                params[name] = load_network(path, params[name])

        for name in self.trainable_networks:
            if name not in params:
                raise ValueError(
                    f"trainable network {name!r} does not exist; have "
                    f"{sorted(params)}")

        labels = {
            name: ("train" if name in self.trainable_networks else "freeze")
            for name in params
        }
        lr = self.learning_rate
        if self.lr_schedule == "cosine":
            lr = optax.cosine_decay_schedule(self.learning_rate,
                                             self.decay_steps, alpha=0.1)
            self.lr_schedule_fn = lr
        train_tx = optax.adam(lr)
        if self.grad_clip:
            train_tx = optax.chain(
                optax.clip_by_global_norm(self.grad_clip), train_tx)
        self.optimizer = optax.multi_transform(
            {"train": train_tx, "freeze": optax.set_to_zero()},
            labels,
        )
        if self.skip_nonfinite:
            # Wrap OUTSIDE multi_transform so the finiteness check sees the
            # raw gradient tree (inside, frozen leaves are MaskedNodes).
            # max_consecutive_errors is effectively infinite: persistent
            # divergence is handled host-side (divergence_abort raises) —
            # letting optax "give up" would re-poison the params instead.
            self.optimizer = optax.apply_if_finite(
                self.optimizer, max_consecutive_errors=2**30)
        self.params = params
        self.opt_state = self.optimizer.init(params)

        if self.mesh is not None:
            self.params = replicate(self.params, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._train_multi = jax.jit(self._train_multi_impl,
                                    donate_argnums=(0, 1))
        self._eval = jax.jit(self._loss_fn)
        self._np_rng = np.random.default_rng(self.seed + 1)
        # Separate stream for validation draws: evaluate() must not
        # consume training draws, or val_every changes the training batch
        # sequence and breaks seed-reproducible A/Bs.
        self._val_rng = np.random.default_rng(self.seed + 7919)
        self.step_count = 0
        self._prepared = True
        return self

    # ----------------------------------------------------------- sequencing

    def _cfe_step(self, params, state, target_obs, keep_force: bool = False):
        x = self.pde.cfe_inputs(state, target_obs)
        apply = lambda p, x: self.cfe.apply({"params": p}, x)
        if self.remat == "selective":
            # Net-only remat: store physics residuals, recompute only the
            # net. Measured slower than whole-body remat at 64² n=16 (see
            # sequences.py) but kept for regimes where physics recompute
            # dominates.
            apply = jax.checkpoint(apply)
        out = apply(params["CFE"], x)
        force = self.pde.force_from_net(out, state)
        nxt = self.pde.step(state, force)
        cost = self.pde.force_cost(force)
        if keep_force:
            return nxt, {"cost": cost, "force": force}
        return nxt, {"cost": cost}

    def _op_fn(self, params):
        def op(span, o_a, o_b):
            x = self.pde.op_inputs(o_a, o_b)
            apply = lambda p, x: self.ops[span].apply({"params": p}, x)
            if self.remat == "selective":
                apply = jax.checkpoint(apply)
            return apply(params[f"OP{span}"], x)

        return op

    def rollout(self, params, batch, keep_states: bool = False,
                keep_forces: bool = False):
        """Run the configured sequence. Returns (obs_traj (n, B, *s, C),
        aux, final_state[, states]) where aux is a dict with per-step
        'cost' (n, B) and, with keep_forces, 'force' — the actual control
        force fields, a pytree with a leading time axis (reference:
        infer_all_frames returns states AND forces [R], SURVEY §3.5)."""
        gt = _time_major(batch["obs"])[: self.n + 1]  # (n+1, B, *s, C)
        state0 = self.pde.initial_state(batch)
        step_fn = lambda s, t: self._cfe_step(params, s, t,
                                              keep_force=keep_forces)
        observe = self.pde.observe

        if self.sequence_class == "chain":
            targets = gt[1:]
        elif self.sequence_class == "chain_final":
            targets = jnp.broadcast_to(gt[-1][None], (self.n,) + gt[-1].shape)
        elif self.sequence_class == "staggered":
            ts = staggered_targets(self._op_fn(params), gt[0], gt[-1], self.n)
            targets = jnp.stack(ts[1:])
        elif self.sequence_class == "refined":
            runner = (run_refined_scan if self.refined_impl == "scan"
                      else run_refined)
            out = runner(
                step_fn, self._op_fn(params), observe, state0, gt[-1],
                self.n, self.remat, keep_states=keep_states)
            if keep_states:
                final, obs_traj, aux, states = out
                return obs_traj, aux, final, states
            final, obs_traj, aux = out
            return obs_traj, aux, final
        else:
            raise ValueError(self.sequence_class)

        if keep_states:
            final, obs_traj, aux, states = run_chain(
                step_fn, observe, state0, targets, self.remat,
                keep_states=True, unroll=self.scan_unroll)
            return obs_traj, aux, final, states
        final, obs_traj, aux = run_chain(
            step_fn, observe, state0, targets, self.remat,
            unroll=self.scan_unroll)
        return obs_traj, aux, final

    # ---------------------------------------------------------------- losses

    def _op_supervised_loss(self, params, batch):
        """Per-level OP pretraining: aligned triples from ground truth
        (reference stage 3, §3.4)."""
        gt = _time_major(batch["obs"])
        op = self._op_fn(params)
        loss = 0.0
        metrics = {}
        trained_spans = [s for s in self.op_spans
                         if f"OP{s}" in self.trainable_networks]
        for span in trained_spans or self.op_spans:
            lvl = 0.0
            count = 0
            for a in range(0, self.n - span + 1, span):
                pred = op(span, gt[a], gt[a + span])
                lvl = lvl + jnp.mean((pred - gt[a + span // 2]) ** 2)
                count += 1
            lvl = lvl / max(count, 1)
            metrics[f"op{span}_mse"] = lvl
            loss = loss + lvl
        metrics["loss"] = loss  # evaluate() contract: every stage has it
        return loss, metrics

    def _loss_fn(self, params, batch):
        if self.sequence_class == "op_supervised":
            return self._op_supervised_loss(params, batch)
        gt = _time_major(batch["obs"])
        obs_traj, aux, _ = self.rollout(params, batch)
        costs = aux["cost"]
        metrics = {}
        loss = 0.0
        for f in self.obs_loss_frames:
            mse = jnp.mean((obs_traj[f - 1] - gt[f]) ** 2)
            metrics[f"obs_mse_f{f}"] = mse
            loss = loss + mse
        force_total = jnp.mean(jnp.sum(costs, axis=0))
        metrics["force_cost"] = force_total
        loss = loss + self.force_reg * force_total
        metrics["loss"] = loss
        return loss, metrics

    # ------------------------------------------------------------- training

    def _train_step_impl(self, params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(params, batch)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        if self.skip_nonfinite:
            # Observability for skipped (non-finite) updates: total count
            # and the CURRENT consecutive streak (the host loop aborts the
            # stage when the streak exceeds divergence_abort).
            metrics["notfinite_total"] = opt_state.total_notfinite
            metrics["notfinite_consec"] = opt_state.notfinite_count
        return params, opt_state, metrics

    def _train_multi_impl(self, params, opt_state, batches):
        """K fused optimizer steps in ONE device program (batches have a
        leading (K, B, …) axis). TPU-idiomatic: dispatching each step
        separately costs a host↔device round trip per step (measured ~7 ms
        over the axon tunnel — 20%+ of a 64² n=16 iteration); scanning the
        optimizer loop on-device amortizes it to one."""

        def body(carry, batch):
            p, s = carry
            p, s, metrics = self._train_step_impl(p, s, batch)
            return (p, s), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), batches)
        return params, opt_state, metrics

    def _device_batch(self, batch):
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return batch

    def _device_batch_multi(self, batches):
        if self.mesh is not None:
            from pde_control_tpu.parallel.mesh import shard_batch_multi

            return shard_batch_multi(batches, self.mesh)
        return jax.device_put(batches)

    def progress(self, batch=None):
        """One optimization step (reference: LearningApp.progress, §3.3)."""
        assert self._prepared, "call prepare() first"
        if batch is None:
            batch = self.dataset.sample(self._np_rng, self.batch_size)
        batch = self._device_batch(batch)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, batch)
        self.step_count += 1
        return metrics

    def progress_multi(self, batches):
        """K fused optimization steps. `batches`: a batch pytree with a
        leading (K, B, …) axis (stack K sampled batches). Returns the
        stacked metrics of all K steps (leading K axis)."""
        assert self._prepared, "call prepare() first"
        batches = self._device_batch_multi(batches)
        self.params, self.opt_state, metrics = self._train_multi(
            self.params, self.opt_state, batches)
        self.step_count += int(
            next(iter(jax.tree_util.tree_leaves(batches))).shape[0])
        return metrics

    def sample_batches(self, k: int):
        """Stack k sampled batches along a new leading axis (for
        progress_multi)."""
        if hasattr(self.dataset, "sample_stacked"):
            return self.dataset.sample_stacked(self._np_rng, k,
                                               self.batch_size)
        samples = [self.dataset.sample(self._np_rng, self.batch_size)
                   for _ in range(k)]
        return jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *samples)

    def _prefetch(self):
        """Sample the next batch and start its (async) host→device copy —
        overlaps data transfer with the in-flight training step."""
        batch = self.dataset.sample(self._np_rng, self.batch_size)
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return jax.device_put(batch)

    def autosave(self, directory: str) -> None:
        """Crash-safe periodic save_state: write to a sibling tmp dir, move
        the previous autosave ASIDE (not rmtree — deleting it first would
        open a window with NO autosave at all), swap the tmp in, then drop
        the old one. A kill at any point leaves either the old or the new
        state restorable (state.json is written last, so a half-written tmp
        never looks complete; try_restore_autosave falls back to the .old
        dir if the swap itself was interrupted)."""
        import shutil

        tmp, old = directory + ".tmp", directory + ".old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        self.save_state(tmp)
        if os.path.isdir(directory):
            os.replace(directory, old)
        os.replace(tmp, directory)
        shutil.rmtree(old, ignore_errors=True)

    def try_restore_autosave(self, directory: str) -> int:
        """Restore a mid-stage autosave if one exists (falling back to the
        rename-aside `.old` copy if a kill interrupted the swap); returns
        the restored optimizer-step count (0 = nothing restored).
        Dataset-sampling RNG position is NOT part of the state: a resumed
        stage sees a different batch order than the uninterrupted run
        would have."""
        for src in (directory, directory + ".old"):
            if os.path.exists(os.path.join(src, "state.json")):
                self.restore_state(src)
                return self.step_count
        return 0

    def train(self, iterations: int, log_every: int = 50,
              val_every: int | None = None, render: bool = True,
              steps_per_call: int = 1, autosave_dir: str | None = None,
              autosave_every: int = 500,
              autosave_restore: bool = False) -> dict:
        """Run the stage; returns the last metrics dict (floats).

        steps_per_call > 1 fuses that many optimizer steps into one device
        program (progress_multi) — one host↔device round trip per call
        instead of per step (the tunnel costs ~7 ms/dispatch, measured).
        `iterations` is then rounded UP to a multiple of steps_per_call
        (avoids compiling a second fused program for a short tail chunk).

        autosave_dir enables mid-stage crash recovery: every
        `autosave_every` optimizer steps the full training state (params +
        opt_state + step counter, LR-schedule position included) is
        checkpointed; with autosave_restore=True, an existing autosave is
        restored first and only `iterations - restored_step` steps run.
        `iterations` stays the TOTAL step count for the stage.

        When a logdir is set, every `log_every` steps the current rollout's
        final frame is rendered next to its target (PNG under the logdir +
        TensorBoard image) — the reference LearningApp's live field
        summaries [R] (SURVEY §5, VERDICT r1 item 9)."""
        restored = 0
        if autosave_dir and autosave_restore:
            restored = self.try_restore_autosave(autosave_dir)
            if restored >= iterations:
                # iterations_run is the stage's TOTAL optimizer-step count
                # (ADVICE r2 contract) — all of it ran in prior invocations.
                return {"resumed_mid_stage": restored,
                        "iterations_run": restored}
        if steps_per_call > 1:
            return self._train_fused(iterations - restored, log_every,
                                     val_every, render, steps_per_call,
                                     autosave_dir, autosave_every, restored)
        last = {}
        t0 = time.time()
        iterations = iterations - restored
        next_autosave = autosave_every
        nxt = self._prefetch()
        for i in range(iterations):
            cur = nxt
            if i + 1 < iterations:
                nxt = self._prefetch()  # overlaps with the step below
            metrics = self.progress(cur)
            if (i + 1) % log_every == 0 or i == iterations - 1:
                last = {k: float(v) for k, v in metrics.items()}
                last["steps_per_sec"] = (i + 1) / (time.time() - t0)
                self.logger.log(self.step_count, last, prefix="train/")
                self._check_divergence(last)
                if render:
                    self._render_progress(cur)
            if val_every and (i + 1) % val_every == 0 and self.val_dataset:
                v = self.evaluate()
                self.logger.log(self.step_count, v, prefix="val/")
            if autosave_dir and i + 1 >= next_autosave:
                next_autosave += autosave_every
                self.autosave(autosave_dir)
        if restored:
            last["resumed_mid_stage"] = restored
            last["iterations_run"] = restored + iterations
        return last

    def _train_fused(self, iterations: int, log_every: int,
                     val_every: int | None, render: bool, k: int,
                     autosave_dir: str | None = None,
                     autosave_every: int = 500, restored: int = 0) -> dict:
        """Multi-step-per-dispatch training loop (see train)."""
        requested = iterations
        if iterations % k:
            # Round UP to a whole number of K-step chunks: a shorter tail
            # chunk would be a second full fused program — another multi-
            # minute XLA compile through the remote relay for < k steps.
            iterations = (iterations // k + 1) * k
        last = {}
        t0 = time.time()
        done = 0
        next_autosave = autosave_every
        nxt = self._device_batch_multi(self.sample_batches(k))
        next_log = log_every
        next_val = val_every or 0
        while done < iterations:
            cur = nxt
            k_cur = int(next(iter(
                jax.tree_util.tree_leaves(cur))).shape[0])
            k_next = min(k, iterations - done - k_cur)
            if k_next > 0:
                nxt = self._device_batch_multi(self.sample_batches(k_next))
            metrics = self.progress_multi(cur)
            done += k_cur
            if done >= next_log or done >= iterations:
                while next_log <= done:
                    next_log += log_every
                last = {key: float(v[-1]) for key, v in metrics.items()}
                last["steps_per_sec"] = done / (time.time() - t0)
                self.logger.log(self.step_count, last, prefix="train/")
                self._check_divergence(last)
                if render:
                    self._render_progress(jax.tree_util.tree_map(
                        lambda x: x[-1], cur))
            if val_every and done >= next_val and self.val_dataset:
                while next_val <= done:
                    next_val += val_every
                v = self.evaluate()
                self.logger.log(self.step_count, v, prefix="val/")
            if autosave_dir and done >= next_autosave:
                while next_autosave <= done:
                    next_autosave += autosave_every
                self.autosave(autosave_dir)
        # Record the ACTUAL optimizer-step count (ADVICE r2): the round-up
        # above means train(10, k=8) runs 16 steps — iteration-matched
        # comparisons must read this, not the requested value. After a
        # mid-stage resume it is the stage TOTAL (restored + run here).
        last["iterations_run"] = restored + iterations
        if restored:
            last["resumed_mid_stage"] = restored
        if iterations != requested:
            self.logger.log(self.step_count,
                            {"iterations_requested": requested,
                             "iterations_run": iterations}, prefix="train/")
        return last

    def _check_divergence(self, last: dict) -> None:
        """Abort the stage once every update in a long consecutive streak
        was non-finite (and therefore skipped by apply_if_finite): the
        params are stuck at their last finite value and the forward pass
        NaNs deterministically from there — burning the remaining budget
        cannot recover. Checked at log points, so detection granularity is
        `log_every` (steps_per_call for fused loops)."""
        if (self.divergence_abort
                and last.get("notfinite_consec", 0) >= self.divergence_abort):
            raise RuntimeError(
                f"stage diverged: {int(last['notfinite_consec'])} consecutive "
                f"non-finite-gradient steps (total skipped "
                f"{int(last.get('notfinite_total', 0))}) at step "
                f"{self.step_count}. Params remain at the last finite value. "
                "Typical causes: force_reg too small (forces blow past the "
                "CFL clip), lr too high, or non-finite training data.")

    def _render_progress(self, batch) -> None:
        """Render rollout-final vs target fields to the logdir (+TB)."""
        if not self.logger.logdir or self.sequence_class == "op_supervised":
            return
        import os

        from pde_control_tpu.utils.viz import save_comparison_png, tb_image

        obs_traj, _, _ = self.infer_all_frames(batch)
        pred = np.asarray(obs_traj[self.n - 1])[0, ..., 0]
        tgt = np.asarray(batch["obs"])[0, self.n, ..., 0]
        save_comparison_png(
            {"rollout final": pred, "target": tgt},
            os.path.join(self.logger.logdir,
                         f"fields_{self.step_count:06d}.png"))
        if pred.ndim == 2:
            tb_image(self.logger, "rollout_final", pred, self.step_count)
            tb_image(self.logger, "target", tgt, self.step_count)

    def evaluate(self, batch=None) -> dict:
        if batch is None:
            batch = self.val_dataset.sample(self._val_rng, self.batch_size)
        batch = self._device_batch(batch)
        _, metrics = self._eval(self.params, batch)
        return {k: float(v) for k, v in metrics.items()}

    def infer_all_frames(self, batch, keep_states: bool = False,
                         keep_forces: bool = False):
        """Full-sequence inference (reference: infer_all_frames, §3.5).
        Returns (obs_traj, force_costs, final_state[, states][, forces]) —
        `forces` is the per-step control-force pytree (leading time axis),
        so what the controller actually did can be inspected/rendered."""
        batch = self._device_batch(batch)
        key = (keep_states, keep_forces)
        if not hasattr(self, "_infer_jits"):
            self._infer_jits = {}
        if key not in self._infer_jits:
            self._infer_jits[key] = jax.jit(
                lambda p, b: self.rollout(p, b, keep_states=keep_states,
                                          keep_forces=keep_forces))
        out = self._infer_jits[key](self.params, batch)
        if keep_states:
            obs_traj, aux, final, states = out
        else:
            obs_traj, aux, final = out
        result = [obs_traj, aux["cost"], final]
        if keep_states:
            result.append(states)
        if keep_forces:
            result.append(aux["force"])
        return tuple(result)

    def save_state(self, directory: str) -> None:
        """Full resume checkpoint: params + optimizer state + step counter."""
        from pde_control_tpu.utils.checkpoint import save_training_state

        save_training_state(directory, jax.device_get(self.params),
                            jax.device_get(self.opt_state), self.step_count,
                            {"sequence_class": self.sequence_class})

    def restore_state(self, directory: str) -> None:
        """Resume from save_state (same config/trainable set required)."""
        from pde_control_tpu.utils.checkpoint import load_training_state

        self.params, self.opt_state, self.step_count = load_training_state(
            directory, jax.device_get(self.params),
            jax.device_get(self.opt_state))
        if self.mesh is not None:
            self.params = replicate(self.params, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)

    def save(self, directory: str, names: Sequence[str] | None = None) -> None:
        """Write per-network msgpacks. `names` restricts WHICH networks are
        written — supervised stages saving into a SHARED checkpoint dir must
        pass their trained net only: save() writes every network the app
        holds, so an OP2 stage would also write OP4..OPn at random init,
        and a resumed run's `_ckpt_has` skip would then mistake those for
        completed stages (round-3 bug: --resume-from-scratch runs silently
        skipped all OP pretraining past OP2)."""
        params = jax.device_get(self.params)
        if names is not None:
            missing = [n for n in names if n not in params]
            if missing:
                raise ValueError(f"save(names=...): unknown nets {missing}")
            params = {k: v for k, v in params.items() if k in names}
        save_networks(directory, params, {
            "n": self.n,
            "sequence_class": self.sequence_class,
            "trainable": list(self.trainable_networks),
            "steps": self.step_count,
        })
