"""Spatial domain decomposition: one grid split across the device mesh.

Beyond-reference scaling capability (SURVEY.md §2d: the reference is
single-device; grids are bounded by one accelerator's memory). Here the
2D fluid step runs with every field sharded along the H axis over a
``('space',)`` mesh axis — composable with the batch ``('data',)`` axis
as a 2D mesh — so grids too large for one chip's HBM run split across
the slice, forward and backward (CG pressure projection, implicit-diff
transpose solve, and shift-advection included).

Why `shard_map` and not plain GSPMD annotation: the MAC layout's face
arrays have H+1 rows — H and H+1 are coprime, so no mesh size divides
both and `NamedSharding`/`in_shardings` cannot express the staggered
layout (divisibility is enforced at the JAX boundary). The explicit
decomposition sidesteps it with a *lower-face representation*: each rank
owns the H/R cell rows of its slab plus each cell's lower y-face; the
single global top face is carried replicated (and is identically zero
after projection on the closed domains this path supports). Halos move
by `lax.ppermute` over ICI — k+1 rows for the CFL-bounded shift
advection window, 1 row for stencils — and the CG solver's inner
products and nullspace projection become `psum` over the space axis.
Everything else stays the same math as physics/fluid.py, so the sharded
program is pinned to the dense one by tests/test_spatial.py (forward
AND gradients, on an 8-device CPU mesh).

Scope (validated, documented): closed domains (walls/obstacles — all
benchmark fluid tasks), viscosity 0, shift advection. Pressure solves
(round 4): the global DCT-II Neumann solve runs DISTRIBUTED — the W-axis
basis matmul is local, the H-axis matmul is computed as per-slab partial
products combined with `lax.psum_scatter` (the classic distributed-
transpose pattern: two reduce-scatters of the field per apply, FLOPs
perfectly sharded). Obstacle-free domains use it as the EXACT solve (no
iteration at all); obstacle domains use it as the deflated preconditioner
inside the distributed CG — measured 14-17x fewer iterations than
plain CG at 128²-512² (475→34, 1768→107; scripts/spatial_scaling.py).
One-level counts still grow ~O(N) on the benchmark obstacle domains (the
plates scale WITH the domain, so the un-preconditioned perturbation is
not local); the 'pcg2' mode adds a two-level variant — a Galerkin
coarse-space correction over fluid-masked block indicators (A-DEF2
around the spectral apply; `_PressureOps._coarse_setup`). Round-5
pricing (scripts/spatial_scaling.py, 128²-512²): the trip cut is
CONSTANT in N (34→23, 57→40, 107→71 ≈ 1.45×) at 1.3-1.8× more wall per
solve — not a scaling win, so 'auto' routes to one-level 'pcg' and
'pcg2' stays opt-in (gradient-pinned) for regimes where the coarse
solve amortizes. Generic GSPMD helpers
(`spatial_spec`/`spatial_shard`) remain for divisible-axis pytrees
(centered fields, batches, 3D volumes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pde_control_tpu.grids import Domain2D, Staggered2D
from pde_control_tpu.ops.spectral import (
    _PRECISION,
    _dct_matrix,
    _inv_neumann_eigenvalues,
)
from pde_control_tpu.physics.fluid import FluidConfig, FluidState

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh2d(
    n_data: int, n_space: int, platform: str | None = None,
) -> Mesh:
    """A (n_data, n_space) mesh with axes ('data', 'space').

    Same CPU-fallback contract as parallel.mesh.make_mesh: if the default
    platform has fewer than n_data*n_space devices (one real TPU chip but
    a virtual CPU mesh was requested), fall back to jax.devices('cpu') —
    which honors xla_force_host_platform_device_count — with a warning.
    """
    need = n_data * n_space
    devices = jax.devices(platform) if platform else jax.devices()
    if len(devices) < need and platform is None:
        import warnings

        devices = jax.devices("cpu")
        warnings.warn(
            f"make_mesh2d: default platform has {len(jax.devices())} "
            f"device(s) < {need} requested — FALLING BACK TO CPU devices. "
            "Results validate sharding logic, not TPU execution; pass "
            "platform='cpu' to silence.", stacklevel=2)
    if len(devices) < need:
        raise ValueError(f"requested {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_data, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def spatial_spec(rank: int, ndim: int) -> P:
    """PartitionSpec sharding the first spatial axis (divisible axes only).

    ndim: spatial rank of the PROBLEM (2 for (B, H, W) fields, 3 for
    (B, D, H, W) volumes) — needed because an unbatched 3D domain mask
    (D, H, W) has the same array rank as a batched 2D field (B, H, W).
    """
    if ndim not in (2, 3):
        raise ValueError(f"ndim must be 2 or 3, got {ndim}")
    if rank == ndim + 1:          # batched field: (B, H, W) / (B, D, H, W)
        return P(DATA_AXIS, SPACE_AXIS, *([None] * (rank - 2)))
    if rank == ndim:              # unbatched domain mask: (H, W) / (D, H, W)
        return P(SPACE_AXIS, *([None] * (rank - 1)))
    return P()                    # scalars / per-batch (B,) etc.: replicated


def spatial_shard(tree, mesh: Mesh, ndim: int = 2):
    """device_put a pytree of DIVISIBLE-axis leaves (centered fields,
    masks, batches) with every leaf sharded per spatial_spec. Staggered
    MAC arrays (H+1 faces) can't be expressed this way — use
    spatial_fluid_step, which splits them internally."""

    def one(x):
        rank = getattr(x, "ndim", 0)
        return jax.device_put(
            x, NamedSharding(mesh, spatial_spec(rank, ndim)))

    return jax.tree_util.tree_map(one, tree)


# ---------------------------------------------------------------------------
# Distributed pressure solve (runs INSIDE shard_map on local slabs).
# ---------------------------------------------------------------------------


class _PressureOps:
    """The distributed pressure-solve closures over one rank's slab.

    Built inside shard_map (all arguments are local (B, Hk, W) slabs /
    mask slabs plus the replicated basis matrices); provides the gated
    operator, the global-mean deflation projection, the distributed
    exact/preconditioned solves, and a CG that also reports its iteration
    count (the scaling-study diagnostic; custom_linear_solve discards it).
    """

    def __init__(self, fluid, acc_y_lo, acc_above, acc_x, idx, *, r, w, dx,
                 tol, maxiter, mode, qh, qw, inv_lam, nbh=None, nbw=None):
        self.fluid, self.idx, self.r, self.w, self.dx = fluid, idx, r, w, dx
        self.acc_y_lo, self.acc_above, self.acc_x = acc_y_lo, acc_above, acc_x
        self.tol, self.maxiter, self.mode = tol, maxiter, mode
        self.qh, self.qw, self.inv_lam = qh, qw, inv_lam
        self.n_fluid = jnp.maximum(lax.psum(jnp.sum(fluid), SPACE_AXIS), 1.0)
        self.coarse_q = (self._coarse_setup(nbh, nbw) if mode == "pcg2"
                         else None)

    def psum_dot(self, a, b):
        return lax.psum(
            jnp.sum(a * b, axis=(1, 2), keepdims=True), SPACE_AXIS)

    def project(self, p):
        mean = lax.psum(
            jnp.sum(p * self.fluid, axis=(1, 2), keepdims=True),
            SPACE_AXIS) / self.n_fluid
        return jnp.where(self.fluid > 0, p - mean, p)

    def grad_p(self, p):
        """Gated ∇p: (gy_lo, gy_hi, gx) — gy_hi is the slab's top face
        row (face index Hk), needed by the divergence."""
        r, dx = self.r, self.dx
        p_prev = _pperm_from_prev(p, 1, r)  # rank 0: killed by gate
        p_next = _pperm_from_next(p, 1, r)  # top:    killed by gate
        pm = jnp.concatenate([p_prev, p[:, :-1, :]], axis=1)
        gy_lo = (p - pm) / dx * self.acc_y_lo
        gy_hi = (p_next - p[:, -1:, :]) / dx * self.acc_above
        gxp = jnp.pad(p, ((0, 0), (0, 0), (1, 1)))
        gx = (gxp[:, :, 1:] - gxp[:, :, :-1]) / dx * self.acc_x
        return gy_lo, gy_hi, gx

    def matvec_raw(self, p):
        gy_lo, gy_hi, gx = self.grad_p(p)
        lap = (jnp.concatenate([gy_lo[:, 1:, :], gy_hi], axis=1) - gy_lo
               + gx[:, :, 1:] - gx[:, :, :-1]) / self.dx
        return jnp.where(self.fluid > 0, -lap, p)

    def matvec(self, p):
        return self.project(self.matvec_raw(self.project(p)))

    def dist_spectral(self, rhs):
        """Distributed global DCT-II Neumann pseudo-inverse apply.

        rhs: (B, Hk, W) slab → (B, Hk, W) slab of pinv(A_neumann)·rhs,
        identical math to ops/spectral.py::spectral_neumann_solve. The
        W-axis basis matmuls are local (W unsharded); the H-axis ones
        are per-slab partial products combined by `lax.psum_scatter`
        over 'space' — first scattering the W axis (so the eigenvalue
        multiply and the inverse-H matmul are local in H), then
        scattering H back to slabs. Two reduce-scatters of the field
        per apply; all four matmuls' FLOPs scale 1/r.
        """
        qh, qw, inv_lam, idx = self.qh, self.qw, self.inv_lam, self.idx
        hk, wk = rhs.shape[1], self.w // self.r
        # forward W-axis DCT (local)
        c = jnp.einsum("lw,bhw->bhl", qw, rhs, precision=_PRECISION,
                       preferred_element_type=jnp.float32)
        # forward H-axis DCT (distributed): partial over my slab rows
        qh_blk = lax.dynamic_slice_in_dim(qh, idx * hk, hk, axis=1)
        part = jnp.einsum("kh,bhl->bkl", qh_blk, c, precision=_PRECISION,
                          preferred_element_type=jnp.float32)
        spec = lax.psum_scatter(part, SPACE_AXIS, scatter_dimension=2,
                                tiled=True)          # (B, H, W/r)
        lam_blk = lax.dynamic_slice_in_dim(inv_lam, idx * wk, wk, axis=1)
        spec = spec * lam_blk[None]
        # inverse H-axis DCT (local: full H is resident)
        sp = jnp.einsum("kh,bkl->bhl", qh, spec, precision=_PRECISION,
                        preferred_element_type=jnp.float32)
        # inverse W-axis DCT (distributed): partial over my l-block
        qw_blk = lax.dynamic_slice_in_dim(qw, idx * wk, wk, axis=0)
        part2 = jnp.einsum("lw,bhl->bhw", qw_blk, sp, precision=_PRECISION,
                           preferred_element_type=jnp.float32)
        return lax.psum_scatter(part2, SPACE_AXIS, scatter_dimension=1,
                                tiled=True)          # (B, Hk, W)

    def precond(self, res):
        # Deflated: P ∘ M⁻¹ ∘ P stays SPD on the compatible subspace
        # (same construction as poisson.solve_pressure's 'pcg').
        return self.project(self.dist_spectral(self.project(res)))

    # -- two-level ('pcg2'): coarse-space correction over block indicators --

    def _coarse_setup(self, nbh: int, nbw: int):
        """Build the Galerkin coarse operator E = Zᵀ A Z over FLUID-MASKED
        block-indicator vectors and return the coarse-solve apply
        Q(res) = Z E⁺ Zᵀ res.

        The round-4 scaling study measured the one-level spectral
        preconditioner's obstacle-domain iteration counts still growing
        ~O(N) (34→57→107 at 128²→512²): the benchmark plates scale WITH
        the domain, so the error the unmasked spectral operator misses is
        long-range — exactly what a coarse space fixes (standard two-level
        DDM). Z = indicators of an (nbh × nbw) block partition intersected
        with the fluid mask; blocks align with rank slabs (nbh % r == 0),
        so restriction/prolongation are LOCAL block-sum pooling plus one
        tiny all_gather of the (B, nbh, nbw) coarse vector. E is assembled
        EXACTLY with one batched gated matvec over the Nc basis slabs
        (rhs-independent → hoisted out of the CG loop by XLA), then
        pseudo-inverted (the constant vector — and any all-solid block —
        is in E's nullspace; pinv handles both, consistent with the
        global-mean deflation already applied around it)."""
        hk = self.acc_x.shape[0]
        nbh_loc = nbh // self.r
        ch, cw = hk // nbh_loc, self.w // nbw
        nc = nbh * nbw
        fluid = self.fluid

        def restrict(x):
            # (B, Hk, W) → (B, nbh, nbw): fluid-masked block sums, gathered.
            xb = (x * fluid).reshape(
                x.shape[0], nbh_loc, ch, nbw, cw).sum(axis=(2, 4))
            return lax.all_gather(xb, SPACE_AXIS, axis=1, tiled=True)

        def prolong(c):
            # (B, nbh, nbw) → (B, Hk, W): my block rows, broadcast, masked.
            mine = lax.dynamic_slice_in_dim(
                c, self.idx * nbh_loc, nbh_loc, axis=1)
            full = jnp.broadcast_to(
                mine[:, :, None, :, None],
                (c.shape[0], nbh_loc, ch, nbw, cw),
            ).reshape(c.shape[0], nbh_loc * ch, nbw * cw)
            return full * fluid

        # E via one batched matvec: basis slabs as the batch axis. The
        # gated matvec returns p itself on solid cells, but Z is zero
        # there, so restrict(matvec_raw(Z)) is the pure fluid-restricted
        # Galerkin stiffness.
        z = prolong(jnp.eye(nc, dtype=jnp.float32).reshape(nc, nbh, nbw))
        e = restrict(self.matvec_raw(z)).reshape(nc, nc)
        e = 0.5 * (e + e.T)
        e_pinv = jnp.linalg.pinv(e, rtol=1e-6)

        def q_apply(res):
            c = restrict(res).reshape(res.shape[0], nc)
            c = jnp.einsum("ij,bj->bi", e_pinv, c, precision=_PRECISION)
            return prolong(c.reshape(res.shape[0], nbh, nbw))

        return q_apply

    def precond2(self, res):
        """A-DEF2 two-level apply: M₂⁻¹ = Pᵀ M⁻¹ + Q with P = I − A Q
        (Tang/Nabben/Vuik/Erlangga 2009 — CG-robust with the deflated
        starting vector cg_solve installs), wrapped in the global-mean
        deflation projection like the one-level path."""
        res = self.project(res)
        y = self.project(self.dist_spectral(res))
        return self.project(y - self.coarse_q(self.matvec(y))
                            + self.coarse_q(res))

    def cg_solve(self, rhs, guess):
        """Distributed (preconditioned) CG; returns (x_best, iterations)."""
        matvec, psum_dot = self.matvec, self.psum_dot
        apply_m = {"pcg": self.precond, "pcg2": self.precond2}.get(
            self.mode, lambda res: res)
        x = jnp.zeros_like(rhs) if guess is None else guess
        if self.mode == "pcg2":
            # Deflated start x₀ ← Q b + Pᵀ x₀: makes the (nonsymmetric)
            # A-DEF2 operator CG-robust — residuals stay in the deflated
            # subspace where M₂ is SPD-equivalent. The outer projection
            # strips Q's fluid-mean component (constants are in the gated
            # operator's nullspace, so the residual is unchanged and the
            # returned pressure stays mean-free like the other modes').
            x = self.project(
                self.coarse_q(rhs) + x - self.coarse_q(matvec(x)))
        res = rhs - matvec(x)
        z = apply_m(res)
        d = z
        rz = psum_dot(res, z)
        rs = psum_dot(res, res)
        b2 = jnp.maximum(psum_dot(rhs, rhs), 1e-30)
        tol2 = self.tol * self.tol

        def active(rs_i, rs_best):
            return jnp.logical_and(rs_i / b2 > tol2, rs_i < 4.0 * rs_best)

        def any_active(rs_i, rs_best):
            # The loop body's collectives span the WHOLE mesh, so every
            # rank must run the same number of iterations — a
            # per-'data'-row trip count deadlocks the collective
            # (converged elements are frozen by the safeguards, so the
            # extra iterations are no-ops).
            local = jnp.any(active(rs_i, rs_best)).astype(jnp.float32)
            return lax.pmax(local, (DATA_AXIS, SPACE_AXIS))

        def cond(s):
            flag, i = s[-2], s[-1]
            return jnp.logical_and(i < self.maxiter, flag > 0)

        def body(s):
            x, res, d, rz_i, rs_i, x_best, rs_best, _, i = s
            act = active(rs_i, rs_best)
            ad = matvec(d)
            dad = psum_dot(d, ad)
            ok = jnp.logical_and(act, dad > 0)
            alpha = jnp.where(ok, rz_i / jnp.where(dad > 0, dad, 1.0), 0.0)
            x = x + alpha * d
            res = res - alpha * ad
            z = apply_m(res)
            rz_new = psum_dot(res, z)
            rs_new = psum_dot(res, res)
            beta = jnp.where(
                ok, rz_new / jnp.where(rz_i != 0, rz_i, 1.0), 0.0)
            d = z + beta * d
            better = rs_new < rs_best
            x_best = jnp.where(better, x, x_best)
            rs_best = jnp.minimum(rs_new, rs_best)
            return (x, res, d, rz_new, rs_new, x_best, rs_best,
                    any_active(rs_new, rs_best), i + 1)

        s = (x, res, d, rz, rs, x, rs, any_active(rs, rs), jnp.int32(0))
        out = lax.while_loop(cond, body, s)
        return out[5], out[8]

    def make_solve(self, guess):
        if self.mode == "spectral":
            def solve(mv, rhs):
                # Exact: the closed no-obstacle operator is diagonal in
                # the DCT-II basis — no iteration. Projection inside the
                # solve (backward cotangents carry a nullspace component;
                # numerics invariant).
                return self.project(self.dist_spectral(self.project(rhs)))

            return solve

        def solve(mv, rhs):
            return self.cg_solve(
                self.project(rhs),
                None if guess is None else self.project(guess))[0]

        return solve


def _make_pressure_ops(*args, **kwargs) -> _PressureOps:
    return _PressureOps(*args, **kwargs)


def _coarse_block_counts(h: int, w: int, r: int) -> tuple[int, int]:
    """Default 'pcg2' coarse partition: ~16 blocks per axis, with the
    H-axis count a multiple of r (blocks must align with rank slabs so
    restriction stays local) and both counts dividing the grid."""
    k = max(1, 16 // r)
    while k > 1 and h % (r * k):
        k //= 2
    nbh = r * k
    nbw = next((nb for nb in (16, 8, 4, 2, 1) if w % nb == 0), 1)
    return nbh, nbw


# ---------------------------------------------------------------------------
# The shard_map'ed fluid step.
# ---------------------------------------------------------------------------


def _pperm_from_prev(x, rows: int, r: int):
    """`rows` trailing rows of the previous rank's block (zeros at rank 0)."""
    return lax.ppermute(x[:, -rows:, :], SPACE_AXIS,
                        [(i, i + 1) for i in range(r - 1)])


def _pperm_from_next(x, rows: int, r: int):
    """`rows` leading rows of the next rank's block (zeros at top rank)."""
    return lax.ppermute(x[:, :rows, :], SPACE_AXIS,
                        [(i + 1, i) for i in range(r - 1)])


def _edge(x, row: int, rows: int):
    """Replicate one local row `rows` times (global clamp boundary)."""
    return jnp.broadcast_to(
        x[:, row:row + 1, :],
        (x.shape[0], rows, x.shape[2]))


def _sample_shift_local(field, disp_y, disp_x, k, below, above):
    """shift_bilinear_sample_2d on a slab extended with halo rows.

    field: (B, Hk, W) local rows; below: (B, k, W) rows under the slab;
    above: (B, k+1, W) rows over it (the asymmetric window matches the
    dense path's offsets −k..k+1). The W axis is unsharded → plain edge
    pad, identical math to ops/interp.py::shift_bilinear_sample_2d.
    """
    hk, w = field.shape[1], field.shape[2]
    disp_y = jnp.clip(disp_y, -k, k)
    disp_x = jnp.clip(disp_x, -k, k)
    ext = jnp.concatenate([below, field, above], axis=1)
    ext = jnp.pad(ext, ((0, 0), (0, 0), (k, k + 1)), mode="edge")
    out = jnp.zeros_like(field)
    for oy in range(-k, k + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(disp_y - oy))
        row = lax.slice_in_dim(ext, k + oy, k + oy + hk, axis=1)
        for ox in range(-k, k + 2):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(disp_x - ox))
            val = lax.slice_in_dim(row, k + ox, k + ox + w, axis=2)
            out = out + val * (wy * wx)
    return out


def _halos_cell(x, k_lo, k_hi, r, idx):
    """Halo rows for a CELL-indexed field with global clamp boundaries."""
    below = _pperm_from_prev(x, k_lo, r)
    below = jnp.where(idx == 0, _edge(x, 0, k_lo), below)
    above = _pperm_from_next(x, k_hi, r)
    above = jnp.where(idx == r - 1, _edge(x, x.shape[1] - 1, k_hi), above)
    return below, above


def spatial_fluid_step(
    state: FluidState,
    domain: Domain2D,
    cfg: FluidConfig,
    mesh: Mesh,
    force: Staggered2D | None = None,
    buoyancy_factor: jnp.ndarray | None = None,
) -> FluidState:
    """One fluid_step with every field sharded along H over mesh axis
    'space' (and the batch over 'data'). Same semantics as
    physics/fluid.py::fluid_step for the supported scope: closed domain,
    viscosity 0, shift advection. Pressure backends (mirrors
    poisson._pick_backend on closed domains): 'auto' → exact distributed
    spectral solve without obstacles / distributed spectral-PCG with
    them; explicit 'spectral' / 'pcg' / 'pcg2' (two-level: + coarse-space
    correction — fewer trips on large obstacle domains, more work per
    trip; opt-in until the scaling study picks a routing) / 'jax' (plain
    distributed CG).

    Call under jit (cfg and mesh are static: hashable frozen dataclass /
    Mesh). Inputs may live anywhere — jit reshards them to the
    shard_map's specs; outputs come back sharded along 'space'.
    """
    if not domain.closed:
        raise ValueError("spatial_fluid_step supports closed domains only "
                         "(the dropped global top face is identically zero "
                         "only under wall boundaries)")
    if cfg.viscosity:
        raise ValueError("spatial_fluid_step: viscosity not implemented")
    if cfg.advection_mode != "shift":
        raise ValueError("spatial_fluid_step requires shift advection")
    mode = cfg.pressure_backend
    if mode == "auto":
        # Mirror poisson._pick_backend's closed-domain priorities: exact
        # distributed spectral solve without obstacles, distributed
        # spectral-PCG with them (the single-device Pallas path does not
        # apply to sharded slabs).
        mode = "pcg" if domain.has_obstacles else "spectral"
    if mode == "pallas":
        raise ValueError("spatial_fluid_step: the fused Pallas CG is "
                         "single-device; use 'auto'/'spectral'/'pcg'/'jax'")
    if mode == "spectral" and domain.has_obstacles:
        raise ValueError("'spectral' is exact only for domains without "
                         "obstacles; use 'pcg'/'pcg2' (preconditioned CG)")
    if mode not in ("spectral", "pcg", "pcg2", "jax"):
        raise ValueError(f"unknown pressure backend {cfg.pressure_backend!r}")
    r = mesh.shape[SPACE_AXIS]
    h, w = domain.grid_shape
    k = int(cfg.max_shift)
    if h % r:
        raise ValueError(f"H={h} not divisible by space axis size {r}")
    if mode != "jax" and w % r:
        raise ValueError(f"W={w} not divisible by space axis size {r} "
                         "(the distributed spectral transform reduce-"
                         "scatters along W); use pressure_backend='jax'")
    if h // r < k + 2:
        raise ValueError(f"slab of {h // r} rows < max_shift+2={k + 2}; "
                         "use fewer space shards or a taller grid")
    dt, dx = cfg.dt, domain.dx
    tol, maxiter = cfg.pressure_tol, cfg.pressure_maxiter
    if mode != "jax":
        qh = jnp.asarray(_dct_matrix(h))
        qw = jnp.asarray(_dct_matrix(w))
        inv_lam = jnp.asarray(_inv_neumann_eigenvalues(h, w, dx))
    else:
        qh = qw = inv_lam = None
    nbh, nbw = _coarse_block_counts(h, w, r) if mode == "pcg2" else (None,
                                                                     None)

    def local_step(vy_lo, vy_top, vx, density, inflow, x0,
                   fy_lo, fy_top, fx, buoy, fluid, acc_y_lo, acc_y_top,
                   acc_x, qh, qw, inv_lam):
        idx = lax.axis_index(SPACE_AXIS)
        top = idx == r - 1

        def from_next_face(x_lo, x_top, rows):
            """Rows above a lower-face slab: the next rank's leading lo
            rows; at the top rank, the real global top face then clamp."""
            nxt = _pperm_from_next(x_lo, rows, r)
            fill = jnp.broadcast_to(x_top,
                                    (x_lo.shape[0], rows, x_lo.shape[2]))
            return jnp.where(top, fill, nxt)

        # --- advection (matches advect.py order: density first, then v) --
        vy_above1 = from_next_face(vy_lo, vy_top, 1)
        vy_c = 0.5 * (vy_lo + jnp.concatenate(
            [vy_lo[:, 1:, :], vy_above1], axis=1))
        vx_c = 0.5 * (vx[:, :, :-1] + vx[:, :, 1:])

        d_below, d_above = _halos_cell(density, k, k + 1, r, idx)
        density_new = _sample_shift_local(
            density, -dt * vy_c / dx, -dt * vx_c / dx, k, d_below, d_above)
        if inflow is not None:
            density_new = density_new + dt * inflow

        # vy at y-faces: native vy; vx resampled to faces (prev cell row).
        vxc_prev = _pperm_from_prev(vx_c, 1, r)
        vxc_prev = jnp.where(idx == 0, vx_c[:, :1, :], vxc_prev)
        vx_at_y = 0.5 * (jnp.concatenate([vxc_prev, vx_c[:, :-1, :]], axis=1)
                         + vx_c)
        vy_below = _pperm_from_prev(vy_lo, k, r)
        vy_below = jnp.where(idx == 0, _edge(vy_lo, 0, k), vy_below)
        vy_above = from_next_face(vy_lo, vy_top, k + 1)
        vy_new = _sample_shift_local(
            vy_lo, -dt * vy_lo / dx, -dt * vx_at_y / dx, k,
            vy_below, vy_above)

        # vx at x-faces: native vx; vy resampled to x-faces (local W pad).
        vyc_pad = jnp.pad(vy_c, ((0, 0), (0, 0), (1, 1)), mode="edge")
        vy_at_x = 0.5 * (vyc_pad[:, :, :-1] + vyc_pad[:, :, 1:])
        vx_below, vx_above = _halos_cell(vx, k, k + 1, r, idx)
        vx_new = _sample_shift_local(
            vx, -dt * vy_at_x / dx, -dt * vx / dx, k, vx_below, vx_above)

        # --- forces / buoyancy (on the ADVECTED density, as in fluid.py) -
        if fy_lo is not None:
            vy_new = vy_new + dt * fy_lo
            vx_new = vx_new + dt * fx
        b = cfg.buoyancy if buoy is None else buoy
        if buoy is not None or cfg.buoyancy:
            dn_prev = _pperm_from_prev(density_new, 1, r)
            dn_prev = jnp.where(idx == 0, density_new[:, :1, :], dn_prev)
            d_at_y = 0.5 * (jnp.concatenate(
                [dn_prev, density_new[:, :-1, :]], axis=1) + density_new)
            vy_new = vy_new + dt * b * d_at_y

        # --- projection: mask, divergence, CG solve, correct -------------
        vy_m = vy_new * acc_y_lo
        vx_m = vx_new * acc_x
        vy_m_above = from_next_face(vy_m, jnp.zeros_like(vy_top), 1)
        div = (jnp.concatenate([vy_m[:, 1:, :], vy_m_above], axis=1) - vy_m
               + vx_m[:, :, 1:] - vx_m[:, :, :-1]) / dx

        acc_above = from_next_face(acc_y_lo[None], acc_y_top[None], 1)[0]
        ops = _make_pressure_ops(
            fluid, acc_y_lo, acc_above, acc_x, idx, r=r, w=w, dx=dx,
            tol=tol, maxiter=maxiter, mode=mode, qh=qh, qw=qw,
            inv_lam=inv_lam, nbh=nbh, nbw=nbw)

        rhs = jnp.where(fluid > 0, -div, 0.0)
        guess = None if x0 is None else lax.stop_gradient(x0)
        if mode == "spectral":
            guess = None  # exact solve — a starting guess is meaningless
        p = lax.custom_linear_solve(
            ops.matvec, rhs, solve=ops.make_solve(guess), symmetric=True,
            transpose_solve=(ops.make_solve(None)
                             if guess is not None else None))

        gy_lo, _, gx = ops.grad_p(p)
        return vy_m - gy_lo, vx_m - gx, density_new, p

    # ---- assemble specs and run --------------------------------------
    bspec = P(DATA_AXIS, SPACE_AXIS, None)   # batched, H-sharded
    tspec = P(DATA_AXIS, None, None)         # batched, H-replicated (tops)
    mspec = P(SPACE_AXIS, None)              # unbatched mask
    rspec = P()                              # replicated

    vy_lo, vy_top = state.velocity.vy[:, :-1, :], state.velocity.vy[:, -1:, :]
    has_force = force is not None
    fy_lo = force.vy[:, :-1, :] if has_force else None
    fy_top = force.vy[:, -1:, :] if has_force else None
    fx = force.vx if has_force else None
    buoy = buoyancy_factor
    inflow = state.inflow
    if inflow is not None and inflow.ndim == 2:
        inflow = jnp.broadcast_to(inflow[None], state.density.shape)
    x0 = state.pressure

    args = (vy_lo, vy_top, state.velocity.vx, state.density, inflow, x0,
            fy_lo, fy_top, fx, buoy, domain.fluid_mask,
            domain.acc_y[:-1, :], domain.acc_y[-1:, :], domain.acc_x,
            qh, qw, inv_lam)
    specs = (bspec, tspec, bspec, bspec,
             bspec if inflow is not None else None,
             bspec if x0 is not None else None,
             bspec if has_force else None,
             tspec if has_force else None,
             bspec if has_force else None,
             tspec if buoy is not None else None,
             mspec, mspec, rspec, mspec,
             rspec if qh is not None else None,
             rspec if qw is not None else None,
             rspec if inv_lam is not None else None)
    in_specs = tuple(s for s, a in zip(specs, args) if a is not None)
    live = tuple(a for a in args if a is not None)
    mask = tuple(a is not None for a in args)

    def wrapper(*live_args):
        it = iter(live_args)
        full = tuple(next(it) if m else None for m in mask)
        return local_step(*full)

    vy_lo2, vx2, density2, p2 = shard_map(
        wrapper, mesh=mesh, in_specs=in_specs,
        out_specs=(bspec, bspec, bspec, bspec), check_vma=False)(*live)

    vy2 = jnp.concatenate(
        [vy_lo2, jnp.zeros_like(state.velocity.vy[:, -1:, :])], axis=1)
    return FluidState(
        velocity=Staggered2D(vy=vy2, vx=vx2), density=density2,
        inflow=state.inflow,
        pressure=p2 if state.pressure is not None else None)


def spatial_pressure_solve_diag(
    div: jnp.ndarray,
    domain: Domain2D,
    mesh: Mesh,
    mode: str = "pcg",
    tol: float = 1e-5,
    maxiter: int = 500,
):
    """Diagnostic distributed pressure solve: returns (p, iterations).

    Same math as the in-step solver (the _PressureOps used by
    spatial_fluid_step), but run OUTSIDE custom_linear_solve so the CG
    trip count escapes — the scaling-study probe for how iteration
    counts scale with N under the distributed spectral preconditioner.
    mode: 'jax' (plain distributed CG) | 'pcg' | 'pcg2' (two-level:
    spectral + coarse-space correction) | 'spectral' (exact,
    obstacle-free; iterations = 0). div: (B, H, W).
    """
    if mode == "spectral" and domain.has_obstacles:
        raise ValueError("'spectral' is exact only without obstacles")
    r = mesh.shape[SPACE_AXIS]
    h, w = domain.grid_shape
    if h % r or (mode != "jax" and w % r):
        raise ValueError(f"grid {h}x{w} not divisible by space={r}")
    dx = domain.dx
    if mode != "jax":
        qh = jnp.asarray(_dct_matrix(h))
        qw = jnp.asarray(_dct_matrix(w))
        inv_lam = jnp.asarray(_inv_neumann_eigenvalues(h, w, dx))
    else:
        qh = qw = inv_lam = None
    nbh, nbw = _coarse_block_counts(h, w, r) if mode == "pcg2" else (None,
                                                                     None)

    def local(div, fluid, acc_y_lo, acc_y_top, acc_x, *spectral):
        idx = lax.axis_index(SPACE_AXIS)
        nxt = _pperm_from_next(acc_y_lo[None], 1, r)
        acc_above = jnp.where(idx == r - 1, acc_y_top[None], nxt)[0]
        qh_, qw_, lam_ = spectral if spectral else (None, None, None)
        ops = _PressureOps(fluid, acc_y_lo, acc_above, acc_x, idx, r=r,
                           w=w, dx=dx, tol=tol, maxiter=maxiter, mode=mode,
                           qh=qh_, qw=qw_, inv_lam=lam_, nbh=nbh, nbw=nbw)
        rhs = ops.project(jnp.where(fluid > 0, -div, 0.0))
        if mode == "spectral":
            return ops.project(ops.dist_spectral(rhs)), jnp.int32(0)
        return ops.cg_solve(rhs, None)

    bspec = P(DATA_AXIS, SPACE_AXIS, None)
    mspec = P(SPACE_AXIS, None)
    rspec = P()
    args = [div, domain.fluid_mask, domain.acc_y[:-1, :],
            domain.acc_y[-1:, :], domain.acc_x]
    specs = [bspec, mspec, mspec, rspec, mspec]
    if mode != "jax":
        args += [qh, qw, inv_lam]
        specs += [rspec, rspec, rspec]
    p, iters = shard_map(local, mesh=mesh, in_specs=tuple(specs),
                         out_specs=(bspec, rspec), check_vma=False)(*args)
    return p, iters
