"""Pallas TPU kernel: the full masked CG pressure-Poisson solve.

TPU-native replacement for the reference's CUDA pressure-solve custom ops
(`phi/tf/cuda/src/pressure_solve_op.*`, `laplace_op.*` [R], SURVEY.md §2c).
Where the reference fuses the Laplace matvec and runs CG inside one CUDA
kernel, here the ENTIRE solve — stencil applies, dot products, axpys, and
the convergence loop — runs inside one Pallas kernel with every CG state
array resident in VMEM: no HBM traffic between iterations and no per-
iteration launch overhead. The pure-JAX `lax.while_loop` CG in
physics/poisson.py remains the correctness oracle and the fallback for
grids too large for VMEM.

Kernel layout notes (Mosaic constraints):
  * grid over the batch axis — each program solves one (H, W) system in 2D
    (3D keepdims reductions crash Mosaic's vector-layout inference), which
    also gives per-sample early exit;
  * reductions go to true scalars (jnp.sum of a 2D array), carried through
    the while_loop in registers.

The operator matches `physics.poisson.masked_laplace_spd` exactly:
A p = −div(acc·grad p) on fluid cells, identity on solid cells, with the
closed-domain nullspace projection applied inside the solve (see
poisson.solve_pressure for why the projection must live here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget gate for the auto backend choice: CG holds ~8 field-sized
# arrays (one batch element each); lane padding can double the footprint.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def pallas_solve_fits(batch: int, h: int, w: int) -> bool:
    padded_w = max(w, 128)
    per_field = h * padded_w * 4  # one element per grid program
    return 10 * per_field < _VMEM_BUDGET_BYTES


def _cg_kernel(div_ref, accy_ref, accx_ref, fluid_ref, out_ref,
               *, dx: float, closed: bool, tol: float, maxiter: int):
    div = div_ref[0]          # (H, W)
    acc_y = accy_ref[...]     # (H+1, W)
    acc_x = accx_ref[...]     # (H, W+1)
    fluid = fluid_ref[...]    # (H, W)
    inv_dx2 = 1.0 / (dx * dx)
    n_fluid = jnp.maximum(jnp.sum(fluid), 1.0)

    def project(p):
        mean = jnp.sum(p * fluid) / n_fluid
        return jnp.where(fluid > 0, p - mean, p)

    def apply_a(p):
        dy = p[1:, :] - p[:-1, :]
        dxx = p[:, 1:] - p[:, :-1]
        if closed:
            zy = jnp.zeros_like(p[:1, :])
            gy = jnp.concatenate([zy, dy, zy], axis=0)
            zx = jnp.zeros_like(p[:, :1])
            gx = jnp.concatenate([zx, dxx, zx], axis=1)
        else:
            gy = jnp.concatenate([p[:1, :], dy, -p[-1:, :]], axis=0)
            gx = jnp.concatenate([p[:, :1], dxx, -p[:, -1:]], axis=1)
        gy = gy * acc_y
        gx = gx * acc_x
        lap = (gy[1:, :] - gy[:-1, :] + gx[:, 1:] - gx[:, :-1]) * inv_dx2
        a = jnp.where(fluid > 0, -lap, p)
        return project(a) if closed else a

    b = jnp.where(fluid > 0, -div, 0.0)
    if closed:
        b = project(b)

    x = jnp.zeros_like(b)
    r = b  # x0 = 0 → r = b
    d = r
    rs = jnp.sum(r * r)
    b2 = jnp.maximum(jnp.sum(b * b), 1e-30)
    tol2 = tol * tol

    def active(rs_i, rs_best):
        return jnp.logical_and(rs_i / b2 > tol2, rs_i < 4.0 * rs_best)

    def cond(state):
        _, _, _, rs_i, _, rs_best, k = state
        return jnp.logical_and(k < maxiter, active(rs_i, rs_best))

    def body(state):
        x, r, d, rs_i, x_best, rs_best, k = state
        ad = apply_a(d)
        dad = jnp.sum(d * ad)
        ok = dad > 0
        alpha = jnp.where(ok, rs_i / jnp.where(ok, dad, 1.0), 0.0)
        x = x + alpha * d
        r = r - alpha * ad
        rs_new = jnp.sum(r * r)
        beta = jnp.where(ok, rs_new / jnp.where(rs_i > 0, rs_i, 1.0), 0.0)
        d = r + beta * d
        better = rs_new < rs_best
        x_best = jnp.where(better, x, x_best)
        rs_best = jnp.minimum(rs_new, rs_best)
        return x, r, d, rs_new, x_best, rs_best, k + 1

    state = (x, r, d, rs, x, rs, jnp.int32(0))
    _, _, _, _, x_best, _, _ = lax.while_loop(cond, body, state)
    out_ref[0] = x_best


@functools.partial(jax.jit, static_argnames=("dx", "closed", "tol", "maxiter",
                                             "interpret"))
def pallas_pressure_solve(
    div: jnp.ndarray,
    acc_y: jnp.ndarray,
    acc_x: jnp.ndarray,
    fluid: jnp.ndarray,
    dx: float = 1.0,
    closed: bool = True,
    tol: float = 1e-5,
    maxiter: int = 500,
    interpret: bool = False,
) -> jnp.ndarray:
    """Solve the masked pressure-Poisson system in one fused TPU kernel.

    Args:
      div: (B, H, W) velocity divergence.
      acc_y/acc_x/fluid: domain face/cell masks (unbatched geometry).
    Returns: (B, H, W) pressure (zero fluid-mean when closed).
    """
    b, h, w = div.shape
    kernel = functools.partial(_cg_kernel, dx=dx, closed=closed, tol=tol,
                               maxiter=maxiter)
    geom_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct(div.shape, div.dtype),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            geom_spec((h + 1, w)),
            geom_spec((h, w + 1)),
            geom_spec((h, w)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(div, acc_y, acc_x, fluid)
