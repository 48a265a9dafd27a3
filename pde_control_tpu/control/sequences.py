"""Execution-sequence builders: chain / staggered / prediction-refinement.

Rebuild of `src/control/sequences.py` [R] (SURVEY.md §2a "Sequence builders",
§3.2). The reference assembles a static TF1 graph from these recursions; here
they are ordinary trace-time Python composing jit-traced calls — the tree
structure is static given n (a power of two), so there are no dynamic shapes.

Three schemes from the paper:
  * chain      — no OPs; every step is CFE against a given per-step target
                 (supervised: ground-truth next frames; greedy: the final
                 target broadcast to all steps).
  * staggered  — binary-tree OP subdivision precomputes all intermediate
                 observation targets from predictions only, then the CFE
                 chain executes left→right against them.
  * refined    — prediction refinement (paper appendix): midpoint targets
                 are re-predicted from the *executed* state when the left
                 half completes, so later predictions see reality.

Memory/remat (measured on v5e, 64² n=16, batch 8, fused 8-step programs):
`remat` = True (default) | 'selective' | False.
  * True: checkpoint the whole scan body / recursion halves, with the
    pressure solution saved via a checkpoint_name policy (implicit diff
    needs only the solution, never the CG iterates). FASTEST measured:
    29.0 ms/iter vs 32.1 (no remat) vs 34.6 ('selective') — recomputing the
    step forward inside one fused backward region beats paying HBM traffic
    for stored residuals on this chip, and is also the lowest-memory mode.
  * 'selective': checkpoint only the CFE/OP net applications; store physics
    residuals. (Kept because the tradeoff may flip on bigger grids.)
  * False: store everything.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

# step_fn(state, target_obs) -> (next_state, aux) — aux is any pytree of
# per-step outputs (e.g. {'cost': (B,), 'force': ...}); the runners stack
# it along a leading time axis.
StepFn = Callable
# op_fn(span, o_start, o_end) -> o_mid
OpFn = Callable

# Remat policy for rollout bodies: rematerialize everything EXCEPT the
# pressure solutions (checkpoint_name'd in physics/poisson.py) and the
# fused-step outputs (ops/pallas_fluid.py). In the XLA path, p is consumed
# only linearly, so XLA DCEs the recomputed solve anyway (measured: no
# time delta). The 'fluid_step' name is load-bearing: an opaque fused
# kernel CANNOT be partially DCE'd, so without saving its outputs the
# backward sweep re-runs the whole kernel — PCG solve included (measured
# 0.83x). With them saved, the recomputed kernel call is dead (custom_vjp
# residuals are the step inputs) and only the CFE/OP nets rematerialize.
REMAT_POLICY = jax.checkpoint_policies.save_only_these_names(
    "pressure", "fluid_step")



def staggered_targets(
    op_fn: OpFn, o0: jnp.ndarray, on: jnp.ndarray, n: int
) -> list[jnp.ndarray]:
    """Fill all intermediate observation targets by binary subdivision.

    Returns [o_0, ô_1, …, ô_{n-1}, o_n]: endpoints are the given
    observations; interior frames are OP predictions computed top-down
    (span n, then n/2, … then 2). n must be a power of two.

    TPU note: all spans at one tree level share the same OP network, so the
    level's 2^d independent calls are folded into ONE application on a
    2^d·B batch (same math; one MXU-saturating conv stack instead of many
    small ones — measured ~2× on the 15-call n=16 tree).
    """
    if n & (n - 1):
        raise ValueError(f"n must be a power of two, got {n}")
    obs: dict[int, jnp.ndarray] = {0: o0, n: on}
    span = n
    while span >= 2:
        starts = list(range(0, n, span))
        o_a = jnp.concatenate([obs[a] for a in starts], axis=0)
        o_b = jnp.concatenate([obs[a + span] for a in starts], axis=0)
        mids = op_fn(span, o_a, o_b)
        for chunk, a in zip(jnp.split(mids, len(starts), axis=0), starts):
            obs[a + span // 2] = chunk
        span //= 2
    return [obs[i] for i in range(n + 1)]


def run_chain(
    step_fn: StepFn,
    observe: Callable,
    state0,
    targets: jnp.ndarray,
    remat: bool = True,
    keep_states: bool = False,
    unroll: int = 1,
):
    """Execute the CFE chain left→right against per-step targets.

    Args:
      step_fn: (state, target) → (next_state, aux) — aux is any pytree of
        per-step outputs (force cost, and for inference the force fields
        themselves); it is stacked along a leading time axis by the scan.
      observe: state → observation.
      state0: initial full state (pytree).
      targets: (n, B, *spatial, C) — target observation for steps 1..n,
        stacked on a leading time axis (scanned over).
      remat: rematerialize the scan body (needed for long rollouts).
      keep_states: also stack the full state trajectory (inference — the
        reference's infer_all_frames returns every frame's fields [R]).
      unroll: lax.scan unroll factor (XLA fuses across unrolled steps;
        remat still checkpoints per logical step).
    Returns: (final_state, obs_traj (n, B, *s, C), aux_traj) or, with
    keep_states, (..., states) where states has a leading time axis on
    every leaf.
    """

    def body(state, tgt):
        nxt, aux = step_fn(state, tgt)
        out = (observe(nxt), aux, nxt) if keep_states else (observe(nxt), aux)
        return nxt, out

    if remat is True:
        body = jax.checkpoint(body, policy=REMAT_POLICY)
    final, ys = lax.scan(body, state0, targets, unroll=unroll)
    if keep_states:
        obs_traj, aux_traj, states = ys
        return final, obs_traj, aux_traj, states
    obs_traj, aux_traj = ys
    return final, obs_traj, aux_traj


def run_refined(
    step_fn: StepFn,
    op_fn: OpFn,
    observe: Callable,
    state0,
    target: jnp.ndarray,
    n: int,
    remat: bool = True,
    keep_states: bool = False,
):
    """Prediction-refinement execution (paper appendix scheme).

    Recursively: predict the midpoint of [now, now+n] from the *current*
    executed observation, execute the left half against it, then recurse on
    the right half from the actually-reached state.

    step_fn returns (next_state, aux); per-step aux pytrees are stacked on a
    leading time axis. Returns (final_state, obs_traj (n, B, *s, C),
    aux_traj) or, with keep_states, (..., states).
    """
    if n & (n - 1):
        raise ValueError(f"n must be a power of two, got {n}")

    def rec(state, tgt, span):
        if span == 1:
            nxt, aux = step_fn(state, tgt)
            return nxt, [observe(nxt)], [aux], [nxt] if keep_states else []
        o_mid = op_fn(span, observe(state), tgt)
        left = lambda s: rec(s, o_mid, span // 2)
        right = lambda s: rec(s, tgt, span // 2)
        if remat is True:
            # Checkpoint each half: O(log n) live activations along the
            # recursion spine, recompute on the backward sweep.
            left = jax.checkpoint(left, policy=REMAT_POLICY)
            right = jax.checkpoint(right, policy=REMAT_POLICY)
        mid_state, obs_l, aux_l, st_l = left(state)
        end_state, obs_r, aux_r, st_r = right(mid_state)
        return end_state, obs_l + obs_r, aux_l + aux_r, st_l + st_r

    final, obs_list, aux_list, state_list = rec(state0, target, n)
    stack = lambda lst: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *lst)
    if keep_states:
        return final, jnp.stack(obs_list), stack(aux_list), stack(state_list)
    return final, jnp.stack(obs_list), stack(aux_list)


def run_refined_scan(
    step_fn: StepFn,
    op_fn: OpFn,
    observe: Callable,
    state0,
    target: jnp.ndarray,
    n: int,
    remat: bool = True,
    keep_states: bool = False,
):
    """Prediction refinement as a `lax.scan` — same math as `run_refined`,
    O(log n) compiled program instead of O(n).

    `run_refined` unrolls the recursion: n step bodies + n-1 OP calls in one
    program. At config 5's horizon (n=128) that program never finished
    compiling (observed: >2400 s through the XLA frontend on CPU, rc=124).
    The reference's `RefinedSequence` (src/control/sequences.py [R]) had the
    same O(n) static-graph structure; this builder is the TPU-native fix.

    Key observation: execution is left-to-right in time regardless of the
    recursion, and just before executing step i the predictions that get
    (re)computed are exactly the midpoints of the tree intervals that START
    at i. So carry a *target stack* — stack[d] = end-target observation of
    the active span-2^d interval, stack[D]=final target — and per step run a
    top-down cascade of D=log2(n) `lax.cond` blocks (d = D-1 … 0, span =
    2^(d+1)):

      * i % span == 0      → left child starts here: stack[d] =
                             OP_span(o_executed_i, stack[d+1])  (a refinement
                             — the midpoint is re-predicted from reality);
      * elif i % (span/2) == 0 → right child starts here: it inherits the
                             parent's end target, stack[d] = stack[d+1];
      * else               → interval unchanged, keep stack[d].

    The CFE then steps toward stack[0]. Each cond executes only its taken
    branch, so total OP work is the recursion's n-1 calls (amortized ~1 per
    step), while the *compiled* program holds one step body + D cond blocks.
    Pinned equal to `run_refined` (values and gradients) in
    tests/test_control.py.
    """
    if n & (n - 1):
        raise ValueError(f"n must be a power of two, got {n}")
    depth = n.bit_length() - 1  # log2(n)

    def refresh(i, o_cur, stack):
        new = list(stack)
        for d in range(depth - 1, -1, -1):
            span = 1 << (d + 1)
            parent_tgt = new[d + 1]
            copy_or_keep = jnp.where((i % (span // 2)) == 0, parent_tgt,
                                     new[d])
            new[d] = lax.cond(
                (i % span) == 0,
                lambda oc, pt, alt, s=span: op_fn(s, oc, pt),
                lambda oc, pt, alt: alt,
                o_cur, parent_tgt, copy_or_keep)
        return tuple(new)

    def body(carry, i):
        state, stack = carry
        stack = refresh(i, observe(state), stack)
        nxt, aux = step_fn(state, stack[0])
        out = (observe(nxt), aux, nxt) if keep_states else (observe(nxt), aux)
        return (nxt, stack), out

    if remat is True:
        body = jax.checkpoint(body, policy=REMAT_POLICY)
    # Levels < depth are placeholders: step 0 triggers every level's OP
    # branch (0 % span == 0), overwriting them before any read.
    init_stack = (target,) * (depth + 1)
    (final, _), ys = lax.scan(body, (state0, init_stack), jnp.arange(n))
    if keep_states:
        obs_traj, aux_traj, states = ys
        return final, obs_traj, aux_traj, states
    obs_traj, aux_traj = ys
    return final, obs_traj, aux_traj
