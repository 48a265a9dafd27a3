"""Pallas TPU kernel: fused, spectrally-preconditioned CG pressure solve.

TPU-native replacement for the reference's CUDA pressure-solve custom ops
(`phi/tf/cuda/src/pressure_solve_op.*`, `laplace_op.*` [R], SURVEY.md §2c).
Where the reference fuses the Laplace matvec and runs CG inside one CUDA
kernel, here the ENTIRE solve — stencil applies, dot products, axpys,
preconditioner matmuls, and the convergence loop — runs inside one Pallas
kernel with every CG state array resident in VMEM: no HBM traffic between
iterations and no per-iteration launch overhead.

Preconditioning: the exact inverse of the obstacle-FREE operator (DCT-II
basis for closed walls, DST-I for open) is applied per iteration as two
small MXU matmuls per side (the basis matrices live in VMEM) — obstacles
only perturb the operator locally, so PCG converges in ~5-20 iterations vs
~100+ plain CG. Profiled at 64²×8 on v5e: plain-CG kernel 3.2 ms; this
kernel ~1 ms (see bench history). The pure-JAX CG in physics/poisson.py
remains the correctness oracle and the fallback for grids too large for
VMEM.

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

# VMEM budget gate for the auto backend choice: PCG holds ~10 field-sized
# arrays + the two basis matrices; lane padding can double the footprint.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def pallas_solve_fits(batch: int, h: int, w: int, warm: bool = True) -> bool:
    padded_w = max(w, 128)
    per_field = h * padded_w * 4  # one batch element per grid program
    basis = (h * max(h, 128) + w * max(w, 128)) * 4
    fields = 13 if warm else 12  # cold solves carry no x0 operand
    return fields * per_field + 2 * basis < _VMEM_BUDGET_BYTES


def pcg_core(div, x0, acc_y, acc_x, fluid, qy, qyt, qx, qxt, inv_lam,
             *, dx: float, closed: bool, tol: float, maxiter: int,
             precond: bool):
    """The whole preconditioned-CG pressure solve on unbatched (H, W)
    values — usable inside ANY Pallas kernel body (the standalone solve
    kernel below and the fused fluid-step kernel in ops/pallas_fluid.py
    both inline it). x0=None compiles the cold path (no wasted apply_a on
    a known-zero start). Returns the pressure (H, W)."""
    inv_dx2 = 1.0 / (dx * dx)
    n_fluid = jnp.maximum(jnp.sum(fluid), 1.0)

    def project(p):
        if not closed:
            return p
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
        return jnp.where(fluid > 0, -lap, p)

    if precond:

        def dot(a, b):
            # Default (bf16-input) precision: the preconditioner only needs
            # to approximate the obstacle-free inverse — exactness is the
            # outer CG's job. HIGHEST-precision emulation measured 20x
            # slower inside Mosaic at this size.
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def apply_m(r):
            # z = Qᵀ((Q r Qᵀ) ⊙ Λ⁻¹) Q — exact inverse of the
            # obstacle-free operator; deflated on closed domains.
            rh = dot(dot(qy, r), qxt)
            z = dot(dot(qyt, rh * inv_lam), qx)
            return project(z)
    else:

        def apply_m(r):
            return r

    b = jnp.where(fluid > 0, -div, 0.0)
    b = project(b)

    if x0 is not None:
        # Warm start from the previous step's pressure (same projection /
        # masking discipline as the rhs, so iterates stay in the compatible
        # subspace). Warmness is static: the cold path compiles to the old
        # kernel exactly.
        x = project(jnp.where(fluid > 0, x0, 0.0))
        r = b - apply_a(x)
    else:
        x = jnp.zeros_like(b)
        r = b  # x0 = 0 → r = b
    z = apply_m(r)
    d = z
    rz = jnp.sum(r * z)
    rs = jnp.sum(r * r)
    b2 = jnp.maximum(jnp.sum(b * b), 1e-30)
    tol2 = tol * tol

    def active(rs_i, rs_best):
        return jnp.logical_and(rs_i / b2 > tol2, rs_i < 4.0 * rs_best)

    def cond(state):
        _, _, _, _, rs_i, _, rs_best, k = state
        return jnp.logical_and(k < maxiter, active(rs_i, rs_best))

    def body(state):
        x, r, d, rz_i, rs_i, x_best, rs_best, k = state
        ad = apply_a(d)
        dad = jnp.sum(d * ad)
        ok = dad > 0
        alpha = jnp.where(ok, rz_i / jnp.where(ok, dad, 1.0), 0.0)
        x = x + alpha * d
        r = r - alpha * ad
        z = apply_m(r)
        rz_new = jnp.sum(r * z)
        rs_new = jnp.sum(r * r)
        beta = jnp.where(ok, rz_new / jnp.where(rz_i != 0, rz_i, 1.0), 0.0)
        d = z + beta * d
        better = rs_new < rs_best
        x_best = jnp.where(better, x, x_best)
        rs_best = jnp.minimum(rs_new, rs_best)
        return x, r, d, rz_new, rs_new, x_best, rs_best, k + 1

    state = (x, r, d, rz, rs, x, rs, jnp.int32(0))
    _, _, _, _, _, x_best, _, _ = lax.while_loop(cond, body, state)
    return x_best


def _pcg_kernel(div_ref, *refs,
                dx: float, closed: bool, tol: float, maxiter: int,
                precond: bool, warm: bool):
    # The x0 operand exists only on warm solves (ADVICE r2: a zeros
    # placeholder charged VMEM on every cold solve); unpack accordingly.
    if warm:
        x0_ref, *refs = refs
    (accy_ref, accx_ref, fluid_ref, qy_ref, qyt_ref, qx_ref, qxt_ref,
     invlam_ref, out_ref) = refs
    out_ref[0] = pcg_core(
        div_ref[0], x0_ref[0] if warm else None,
        accy_ref[...], accx_ref[...], fluid_ref[...],
        qy_ref[...], qyt_ref[...], qx_ref[...], qxt_ref[...],
        invlam_ref[...],
        dx=dx, closed=closed, tol=tol, maxiter=maxiter, precond=precond)


@functools.partial(jax.jit, static_argnames=("dx", "closed", "tol", "maxiter",
                                             "precond", "interpret"))
def pallas_pressure_solve(
    div: jnp.ndarray,
    acc_y: jnp.ndarray,
    acc_x: jnp.ndarray,
    fluid: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    dx: float = 1.0,
    closed: bool = True,
    tol: float = 1e-5,
    maxiter: int = 500,
    precond: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Solve the masked pressure-Poisson system in one fused TPU kernel.

    Args:
      div: (B, H, W) velocity divergence.
      acc_y/acc_x/fluid: domain face/cell masks (unbatched geometry).
      x0: optional (B, H, W) warm-start guess (previous step's pressure).
      precond: apply the spectral (obstacle-free exact inverse)
        preconditioner — DCT-II for closed walls, DST-I for open.
    Returns: (B, H, W) pressure (zero fluid-mean when closed).
    """
    from pde_control_tpu.ops.spectral import (
        _dct_matrix,
        _dst_matrix,
        _inv_dirichlet_eigenvalues,
        _inv_neumann_eigenvalues,
    )

    b, h, w = div.shape
    if closed:
        qy, qx = _dct_matrix(h), _dct_matrix(w)
        inv_lam = _inv_neumann_eigenvalues(h, w, dx)
    else:
        qy, qx = _dst_matrix(h), _dst_matrix(w)
        inv_lam = _inv_dirichlet_eigenvalues(h, w, dx)

    warm = x0 is not None
    kernel = functools.partial(_pcg_kernel, dx=dx, closed=closed, tol=tol,
                               maxiter=maxiter, precond=precond, warm=warm)
    geom_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    batch_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [batch_spec]
    operands = [div]
    if warm:
        in_specs.append(batch_spec)
        operands.append(x0)
    in_specs += [
        geom_spec((h + 1, w)),
        geom_spec((h, w + 1)),
        geom_spec((h, w)),
        geom_spec((h, h)),
        geom_spec((h, h)),
        geom_spec((w, w)),
        geom_spec((w, w)),
        geom_spec((h, w)),
    ]
    operands += [acc_y, acc_x, fluid, jnp.asarray(qy), jnp.asarray(qy.T),
                 jnp.asarray(qx), jnp.asarray(qx.T), jnp.asarray(inv_lam)]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct(div.shape, div.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*operands)
