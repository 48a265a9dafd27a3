"""Per-phase breakdown of the benchmark training iteration (VERDICT r1
items 3, 6): where do the ~29 ms of the 64² n=16 batch-8 staggered training
iteration go?

Measures, each as its own jitted program (best-of-N wall time on device):
  * full train step (value_and_grad + adam)           — the bench number
  * forward loss only
  * physics rollout only (16 × fluid_step, zero force) fwd and fwd+bwd
  * single fluid_step fwd: advection only / projection only
  * OP target tree (staggered_targets) fwd
  * CFE net applications (16 sequential) fwd
  * optimizer update only
plus an MFU estimate from a conv/matmul FLOP count of the nets and the
physics stencils.

Usage:  python -m pde_control_tpu.experiments.profile_bench [--json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

H, N, B = 64, 16, 8


def _fetch(out):
    """Pull ONE scalar from the output pytree — the trustworthy sync point
    on the axon tunnel (CLAUDE.md: block_until_ready does not reliably
    wait for repeated identical dispatches)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def _timed(fn, *args, trials: int = 5, inner: int = 4) -> float:
    """Best-of-trials mean ms per call.

    Chained protocol: each inner call perturbs its first array argument
    with the previous call's fetched scalar (state carried across calls —
    the dispatches are NOT identical) and the trial ends with a value
    fetch. Round-3 rework: the old repeated-identical-call +
    block_until_ready pattern is exactly the microbenchmark shape the
    tunnel mis-reports (66,000 TFLOP/s incident, CLAUDE.md)."""
    out = fn(*args)
    eps = _fetch(out) * 0.0  # compile + first sync
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(inner):
            if args and hasattr(args[0], "dtype"):
                first = args[0] + jnp.asarray(eps, args[0].dtype)
                out = fn(first, *args[1:])
            else:
                out = fn(*args)
            eps = _fetch(out) * 0.0
        best = min(best, (time.perf_counter() - t0) / inner)
    return best * 1e3


def main() -> None:
    from __graft_entry__ import _make_app, _make_batch

    from pde_control_tpu.control.sequences import staggered_targets
    from pde_control_tpu.physics.fluid import divergence_free, fluid_step

    app = _make_app(H, N, B, maxiter=100)
    batch = jax.device_put(_make_batch(H, N, B))
    jax.block_until_ready(batch)
    pde, params = app.pde, app.params
    state0 = jax.jit(pde.initial_state)(batch)
    obs0 = jax.jit(pde.observe)(state0)

    results: dict[str, float] = {}

    # --- full step & forward ------------------------------------------------
    def train_step(params, opt_state, batch):
        return app._train_step_impl(params, opt_state, batch)

    ts = jax.jit(train_step)
    results["train_step_full"] = _timed(ts, params, app.opt_state, batch)
    fwd = jax.jit(lambda p, b: app._loss_fn(p, b)[0])
    results["forward_loss"] = _timed(fwd, params, batch)

    # --- physics rollout (no nets) -----------------------------------------
    def physics_rollout(state):
        def body(s, _):
            return pde.step(s, None), None

        s, _ = jax.lax.scan(body, state, None, length=N)
        return s.density

    pr = jax.jit(physics_rollout)
    results["physics_rollout_fwd"] = _timed(pr, state0)
    prb = jax.jit(jax.grad(lambda d0: jnp.sum(
        physics_rollout(state0.replace(density=d0)))))
    results["physics_rollout_fwd_bwd"] = _timed(prb, state0.density)

    # --- single-step pieces --------------------------------------------------
    one = jax.jit(lambda s: pde.step(s, None).density)
    results["fluid_step_fwd"] = _timed(one, state0)
    from pde_control_tpu.physics.advect import advect_centered, advect_staggered

    adv = jax.jit(lambda s: (
        advect_staggered(s.velocity, pde.cfg.dt, dx=pde.domain.dx,
                         mode=pde.cfg.advection_mode,
                         max_shift=pde.cfg.max_shift).vy,
        advect_centered(s.density, s.velocity, pde.cfg.dt,
                        dx=pde.domain.dx, mode=pde.cfg.advection_mode,
                        max_shift=pde.cfg.max_shift)))
    results["advection_only_fwd"] = _timed(adv, state0)
    proj = jax.jit(lambda s: divergence_free(
        s.velocity, pde.domain, pde.cfg)[0].vy)
    results["projection_only_fwd"] = _timed(proj, state0)

    # --- OP tree & CFE chain -------------------------------------------------
    op_tree = jax.jit(lambda p, o0, on: jnp.stack(
        staggered_targets(app._op_fn(p), o0, on, N)[1:]))
    results["op_tree_fwd"] = _timed(op_tree, params, obs0, obs0)

    def cfe_chain(params, state, target):
        def body(s, _):
            s2, _aux = app._cfe_step(params, s, target)
            return s2, None

        s, _ = jax.lax.scan(body, state, None, length=N)
        return s.density

    # full CFE chain including physics (= forward minus OP tree)
    results["cfe_chain_with_physics_fwd"] = _timed(
        jax.jit(cfe_chain), params, state0, obs0)

    def cfe_nets_only(params, state, target):
        x = pde.cfe_inputs(state, target)

        def body(acc, _):
            out = app.cfe.apply({"params": params["CFE"]}, x)
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return acc

    results["cfe_nets_only_fwd_x16"] = _timed(
        jax.jit(cfe_nets_only), params, state0, obs0)

    # --- optimizer -----------------------------------------------------------
    zeros_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    opt = jax.jit(lambda g, s, p: app.optimizer.update(g, s, p))
    results["optimizer_update"] = _timed(opt, zeros_grads, app.opt_state,
                                         params)

    # --- derived -------------------------------------------------------------
    steps_per_sec = N * B / (results["train_step_full"] / 1e3)
    results["steps_per_sec"] = steps_per_sec

    if "--json" in sys.argv:
        print(json.dumps({k: round(v, 3) for k, v in results.items()}))
    else:
        width = max(len(k) for k in results)
        for k, v in results.items():
            print(f"{k:<{width}}  {v:10.3f} ms"
                  if k != "steps_per_sec" else f"{k:<{width}}  {v:10.1f}")


if __name__ == "__main__":
    main()
