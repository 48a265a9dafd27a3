"""Differentiable pressure-Poisson solve: masked CG under custom_linear_solve.

Replaces `phi/physics/pressuresolver/{sparse,geom}.py :: SparseCG/GeometricCG`
and the reference's CUDA pressure-solve custom ops [R] (SURVEY.md §2b/§2c).

Key TPU-native deviations from the reference:
  * The reference unrolls CG iterations inside the TF graph so autodiff
    replays them; here `lax.custom_linear_solve(..., symmetric=True)` makes
    the backward pass a single transpose (= same) CG solve — O(1) memory in
    iteration count and ~2× faster backward.
  * The operator is matrix-free: div(acc·grad p) built from the same gated
    stencils as the velocity correction, so operator and correction are
    consistent by construction (no sparse-matrix assembly).

The SPD operator solved is  A p = −div(acc·grad p)  on fluid cells and
identity on solid cells (block-diagonal, symmetric). For closed domains A is
singular with a constant nullspace per connected fluid component; we project
the rhs to zero fluid-mean, which keeps CG in the orthogonal complement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name

from pde_control_tpu.grids import Domain2D


def masked_laplace_spd(p: jnp.ndarray, domain: Domain2D) -> jnp.ndarray:
    """A p = −div(acc·grad p) on fluid cells; p on solid cells. (B, H, W)."""
    grad = domain.pressure_gradient(p)
    lap = grad.divergence(domain.dx)
    fluid = domain.fluid_mask
    return jnp.where(fluid > 0, -lap, p)


def _spatial_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-batch-element inner product over spatial axes, keepdims (B,1,1)."""
    return jnp.sum(a * b, axis=tuple(range(1, a.ndim)), keepdims=True)


def cg(matvec, b: jnp.ndarray, tol: float, maxiter: int, x0=None,
       precond=None, return_iters: bool = False):
    """Batched (preconditioned) conjugate gradients on an SPD matvec.

    `precond`, when given, applies M⁻¹ (must be SPD) — e.g. the spectral
    Neumann inverse, which cuts iteration counts ~10× on obstacle domains.

    Each batch element runs its own CG (per-element α/β via spatial dots).
    Per-element safeguards make this robust in fp32 (verified empirically:
    un-guarded CG iterated past its fp32 convergence floor diverges):
      * an element freezes (α=β=0) once its relative residual is below
        `tol` — no post-convergence drift;
      * an element freezes if its residual grows ≥4× above the best seen
        (fp32 breakdown on singular systems); the best iterate is returned.
    """
    apply_m = precond if precond is not None else (lambda r: r)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = apply_m(r)
    d = z
    rz = _spatial_dot(r, z)
    rs = _spatial_dot(r, r)
    b2 = jnp.maximum(_spatial_dot(b, b), 1e-30)
    tol2 = tol * tol

    def active(rs_i, rs_best):
        return jnp.logical_and(rs_i / b2 > tol2, rs_i < 4.0 * rs_best)

    def cond(state):
        _, _, _, _, rs_i, _, rs_best, k = state
        return jnp.logical_and(k < maxiter, jnp.any(active(rs_i, rs_best)))

    def body(state):
        x, r, d, rz_i, rs_i, x_best, rs_best, k = state
        act = active(rs_i, rs_best)
        ad = matvec(d)
        dad = _spatial_dot(d, ad)
        ok = jnp.logical_and(act, dad > 0)
        alpha = jnp.where(ok, rz_i / jnp.where(dad > 0, dad, 1.0), 0.0)
        x = x + alpha * d
        r = r - alpha * ad
        z = apply_m(r)
        rz_new = _spatial_dot(r, z)
        rs_new = _spatial_dot(r, r)
        beta = jnp.where(ok, rz_new / jnp.where(rz_i != 0, rz_i, 1.0), 0.0)
        d = z + beta * d
        better = rs_new < rs_best
        x_best = jnp.where(better, x, x_best)
        rs_best = jnp.minimum(rs_new, rs_best)
        return x, r, d, rz_new, rs_new, x_best, rs_best, k + 1

    state = (x, r, d, rz, rs, x, rs, jnp.int32(0))
    _, _, _, _, _, x_best, _, k = lax.while_loop(cond, body, state)
    if return_iters:
        return x_best, k
    return x_best


def measure_pressure_iterations(
    div: jnp.ndarray,
    domain: Domain2D,
    tol: float = 1e-5,
    maxiter: int = 500,
    x0: jnp.ndarray | None = None,
    precondition: bool = True,
):
    """Diagnostic: solve the closed-domain pressure system OUTSIDE
    custom_linear_solve and return (p, iterations) — the trip count cannot
    escape the implicit-diff path, so MFU accounting (bench.py) and scaling
    studies measure it here. Uses the pure-JAX deflated-spectral PCG — the
    same preconditioner family and safeguards as the production Pallas
    kernel, so iteration counts transfer (both converge the same SPD
    system to the same tolerance). x0 reproduces the production warm
    start; x0=None measures the cold (backward-cotangent) solve.
    """
    if not domain.closed:
        raise ValueError("diagnostic implemented for closed domains "
                         "(every benchmark fluid task)")
    fluid = domain.fluid_mask
    n_fluid = jnp.maximum(jnp.sum(fluid), 1.0)

    def project(p):
        mean = (jnp.sum(p * fluid, axis=tuple(range(1, p.ndim)),
                        keepdims=True) / n_fluid)
        return jnp.where(fluid > 0, p - mean, p)

    def matvec(p):
        return project(masked_laplace_spd(project(p), domain))

    precond = None
    if precondition:
        from pde_control_tpu.ops.spectral import spectral_neumann_solve

        def precond(r):
            return project(spectral_neumann_solve(project(r), dx=domain.dx))

    b = project(jnp.where(fluid > 0, -div, 0.0))
    x0 = None if x0 is None else project(x0)
    return cg(matvec, b, tol=tol, maxiter=maxiter, x0=x0, precond=precond,
              return_iters=True)


def _pick_backend(backend: str, div: jnp.ndarray, domain: Domain2D) -> str:
    """Resolve 'auto' to a concrete solver path at trace time.

    Priority on closed 2D domains: exact spectral solve (no obstacles) >
    spectral-preconditioned CG (obstacles). Open domains use the fused
    Pallas CG on TPU (when it fits VMEM) or the pure-JAX CG.
    """
    from pde_control_tpu.ops.pallas_cg import pallas_solve_fits

    if div.ndim == 4:
        # 3D volumes (B, D, H, W): the exact matmul-DCT/DST solves and the
        # spectral-preconditioned CG dispatch on ndim (ops/spectral.py);
        # only the fused Pallas kernel is 2D-only.
        if backend == "pallas":
            raise ValueError("the Pallas kernel supports 2D (B, H, W) "
                             "fields only; use 'auto'/'spectral'/'pcg'/'jax'")
        if backend != "auto":
            if backend == "spectral" and domain.has_obstacles:
                raise ValueError("'spectral' is exact only for domains "
                                 "without obstacles; use 'pcg'")
            return backend
        if not domain.has_obstacles:
            return "spectral"
        return "pcg"
    if backend != "auto":
        if backend == "pallas" and not pallas_solve_fits(*div.shape):
            raise ValueError(f"grid {div.shape} exceeds the Pallas VMEM budget")
        if backend == "spectral" and domain.has_obstacles:
            raise ValueError("'spectral' is exact only for domains without "
                             "obstacles; use 'pcg'")
        return backend
    on_tpu = jax.default_backend() == "tpu"
    fits = pallas_solve_fits(*div.shape)
    if domain.closed and div.ndim == 3:
        if not domain.has_obstacles:
            return "spectral"
        # Obstacles: measured at 64²×8 on v5e — fused Pallas CG 3.2ms,
        # spectral-PCG 4.7ms, XLA while_loop CG 103ms at equal accuracy.
        return "pallas" if (on_tpu and fits) else "pcg"
    if div.ndim == 3 and not domain.has_obstacles:
        return "spectral"  # open domain: exact DST-I (Dirichlet) solve
    if on_tpu and fits:
        return "pallas"
    return "jax"


def solve_pressure(
    div: jnp.ndarray,
    domain: Domain2D,
    tol: float = 1e-5,
    maxiter: int = 500,
    backend: str = "auto",
    x0: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Solve div(acc·grad p) = div_v for p. div: (B, H, W) → p: (B, H, W).

    Differentiable via implicit differentiation (`custom_linear_solve`,
    symmetric): the VJP solves the same SPD system once with the cotangent
    as rhs. Domain masks are treated as non-differentiable geometry.

    backend: 'auto' picks, on closed 2D domains, the exact spectral (DCT)
    solve when there are no obstacles, or spectral-preconditioned CG when
    there are; open domains get the fused Pallas CG on TPU / pure-JAX CG.
    Explicit values: 'jax', 'pallas', 'spectral', 'pcg'.

    x0 optionally warm-starts the iterative paths (previous rollout step's
    pressure). It is stop_gradient'd: the converged solution is independent
    of the starting point (to tol), so no AD path may flow through it —
    and custom_linear_solve's transpose machinery must see it as a
    constant, like the geometry masks. The VJP's cotangent solve starts
    COLD (an explicit zero-start transpose_solve): a cotangent's scale is
    unrelated to the primal pressure, so warm-starting it from the primal
    guess would only cost fp32 accuracy. The exact spectral paths ignore
    x0 entirely.

    Forward-mode (JVP) caveat: custom_linear_solve reuses the primal
    `solve` closure for tangent systems, so with x0 set the tangent solve
    is seeded with the primal pressure guess — a starting point of
    unrelated scale that can leave tangents less converged at tight
    maxiter (one closure serves both; seeding only the primal is not
    expressible here). Reverse mode — the training path — is unaffected
    (cold transpose_solve above). Prefer warm_start_pressure=False when
    differentiating this solve in forward mode.
    """
    fluid = lax.stop_gradient(domain.fluid_mask)
    geom = jax.tree_util.tree_map(lax.stop_gradient, domain)
    chosen = _pick_backend(backend, div, domain)
    interpret = jax.default_backend() != "tpu"
    x0 = None if x0 is None else lax.stop_gradient(x0)
    if chosen in ("spectral",):
        x0 = None  # exact solve — a starting guess is meaningless

    b = jnp.where(fluid > 0, -div, 0.0)
    if domain.closed:
        # Closed domain → A is singular (constants-on-fluid nullspace).
        # Project rhs into range(A) and wrap the operator as P∘A∘P so CG
        # iterates stay in the compatible subspace despite fp32 rounding.
        n_fluid = jnp.maximum(jnp.sum(fluid), 1.0)

        def project(p):
            mean = (
                jnp.sum(p * fluid, axis=tuple(range(1, p.ndim)), keepdims=True)
                / n_fluid
            )
            return jnp.where(fluid > 0, p - mean, p)

        def matvec(p):
            return project(masked_laplace_spd(project(p), geom))

        if chosen == "spectral":
            from pde_control_tpu.ops.spectral import spectral_neumann_solve

            def make_solve(guess):
                def solve(mv, rhs):
                    # Exact: the closed no-obstacle operator is diagonal in
                    # the DCT-II basis. Projection inside the solve — the
                    # backward cotangent carries a nullspace component.
                    return project(
                        spectral_neumann_solve(project(rhs), dx=domain.dx))

                return solve

        elif chosen == "pcg":
            from pde_control_tpu.ops.spectral import spectral_neumann_solve

            def precond(r):
                # Deflated spectral preconditioner: P ∘ M⁻¹ ∘ P keeps PCG in
                # the compatible subspace and stays SPD there.
                return project(spectral_neumann_solve(project(r),
                                                      dx=domain.dx))

            def make_solve(guess):
                def solve(mv, rhs):
                    return cg(mv, project(rhs), tol=tol, maxiter=maxiter,
                              precond=precond,
                              x0=None if guess is None else project(guess))

                return solve

        else:

            def make_solve(guess):
                def solve(mv, rhs):
                    # Project the rhs INSIDE the solve: the backward pass
                    # feeds the loss cotangent through this same function,
                    # and that cotangent generally has a nullspace component
                    # — without projection CG's first step explodes and the
                    # pseudo-inverse VJP is lost.
                    return cg(mv, project(rhs), tol=tol, maxiter=maxiter,
                              x0=None if guess is None else project(guess))

                return solve

    else:

        def matvec(p):
            return masked_laplace_spd(p, geom)

        if chosen == "spectral":
            from pde_control_tpu.ops.spectral import spectral_dirichlet_solve

            def make_solve(guess):
                def solve(mv, rhs):
                    # Exact: the open no-obstacle operator is diagonal in
                    # the DST-I basis (nonsingular — no projection needed).
                    return spectral_dirichlet_solve(rhs, dx=domain.dx)

                return solve

        elif chosen == "pcg":
            from pde_control_tpu.ops.spectral import spectral_dirichlet_solve

            def make_solve(guess):
                def solve(mv, rhs):
                    return cg(mv, rhs, tol=tol, maxiter=maxiter, x0=guess,
                              precond=lambda r: spectral_dirichlet_solve(
                                  r, dx=domain.dx))

                return solve

        else:

            def make_solve(guess):
                def solve(mv, rhs):
                    return cg(mv, rhs, tol=tol, maxiter=maxiter, x0=guess)

                return solve

    if chosen == "pallas":
        from pde_control_tpu.ops.pallas_cg import pallas_pressure_solve

        def make_solve(guess):  # noqa: F811 — deliberate override
            def solve(_mv, rhs):
                # The kernel rebuilds b = project(mask(-div)); feeding -rhs
                # makes its b equal rhs (masking/projection are idempotent,
                # and the backward cotangent needs the projection anyway).
                return pallas_pressure_solve(
                    -rhs, geom.acc_y, geom.acc_x, fluid, x0=guess,
                    dx=domain.dx, closed=domain.closed, tol=tol,
                    maxiter=maxiter, interpret=interpret,
                )

            return solve

    # Warm start applies to the primal solve only; the transpose (cotangent)
    # solve starts cold — its rhs has an unrelated scale, and a far-off x0
    # costs fp32 accuracy. With symmetric=True the transpose operator is the
    # same matvec, so the cold solve is exactly the round-1 backward path.
    p = lax.custom_linear_solve(
        matvec, b, solve=make_solve(x0), symmetric=True,
        transpose_solve=make_solve(None) if x0 is not None else None)
    # Name the solution for remat policies (save_only_these_names('pressure')
    # in control/sequences.py). Measured effect at 64² n=16: none — p is
    # consumed only linearly downstream (v - ∇p), so XLA already dead-code-
    # eliminates the recomputed forward solve from remat backward sweeps.
    # Kept as insurance for nonlinear consumers of p (e.g. losses on p).
    return checkpoint_name(p, "pressure")
