"""3D spatial domain decomposition: one VOLUME split across the device mesh.

Round-5 extension of `parallel/spatial.py` (VERDICT r4 item 5): the repo's
strongest beyond-reference family — 3D indirect smoke control
(`experiments/smoke3d.py`, 52.5× at 32³) — was bounded by one device's
memory, the exact gap the decomposition exists to remove, on the PDE family
where memory pressure is worst (working set grows as N³).

Construction mirrors the 2D module's lower-face representation, sharded
along the **z axis** (axis 1 of (B, D, H, W) fields): vz has D+1 faces (D
and D+1 coprime — NamedSharding cannot express it), so each rank owns the
D/R cell slabs of its block plus each cell's LOWER z-face; the single
global top face is carried replicated (identically zero after projection on
the closed domains this path supports). vy (B, D, H+1, W) and vx
(B, D, H, W+1) shard CLEANLY along z — their +1 axes are unsharded — which
is why z is the right axis to cut. Halos move by `lax.ppermute` over ICI
(k+1 planes for the CFL-bounded shift advection window, 1 plane for
stencils); CG inner products and the nullspace projection are `psum` over
the space axis.

Pressure modes (mirrors the 2D module): 'jax' (plain distributed CG),
'spectral' (EXACT distributed 3D DCT-II Neumann solve, obstacle-free
domains — the production 3D smoke tasks), 'pcg' (the spectral solve as a
deflated preconditioner inside distributed CG, obstacle domains). The
distributed 3D transform does the x- and y-axis basis matmuls locally (full
H, W are slab-resident) and the z-axis matmul as per-slab partial products
combined with `lax.psum_scatter` — the same two-reduce-scatter pattern as
the 2D H-axis transform, scattering the y-mode axis on the way up and the
z axis on the way back down, so comms stay at two reduce-scatters of the
field per apply. 'pcg2' is intentionally not ported: the round-5 scaling
study measured the two-level gap CONSTANT in N (≈1.45× fewer trips at
1.5-1.8× cost/trip, 128²-512²), so one-level is the routed default even
in 2D.

Scope (validated by tests/test_spatial3d.py against the dense
physics/fluid3d.py step, forward AND gradients): closed domains, viscosity
0, shift advection — the same envelope as the 2D module, covering every 3D
benchmark task.

Reference: PhiFlow's dimension-general fluid physics (`phi/physics/` [R])
is single-device; SURVEY §2d "grids bounded by one device's memory".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pde_control_tpu.grids3d import Domain3D, Staggered3D
from pde_control_tpu.ops.spectral import (
    _PRECISION,
    _dct_matrix,
    _inv_neumann_eigenvalues_3d,
)
from pde_control_tpu.parallel.spatial import DATA_AXIS, SPACE_AXIS, make_mesh2d
from pde_control_tpu.physics.fluid3d import Fluid3DConfig, FluidState3D

__all__ = ["make_mesh2d", "spatial_fluid3d_step",
           "spatial_pressure_solve3d_diag"]


# ---------------------------------------------------------------------------
# Halo primitives along axis 1 (the sharded z axis) of (B, Zk, ...) arrays.
# ---------------------------------------------------------------------------


def _from_prev(x, planes: int, r: int):
    """`planes` trailing z-planes of the previous rank (zeros at rank 0)."""
    return lax.ppermute(x[:, -planes:], SPACE_AXIS,
                        [(i, i + 1) for i in range(r - 1)])


def _from_next(x, planes: int, r: int):
    """`planes` leading z-planes of the next rank (zeros at the top rank)."""
    return lax.ppermute(x[:, :planes], SPACE_AXIS,
                        [(i + 1, i) for i in range(r - 1)])


def _edge(x, plane: int, planes: int):
    """Replicate one local z-plane `planes` times (global clamp boundary)."""
    return jnp.broadcast_to(x[:, plane:plane + 1],
                            (x.shape[0], planes) + x.shape[2:])


def _halos_cell(x, k_lo, k_hi, r, idx):
    """Halo planes for a CELL-indexed field with global clamp boundaries."""
    below = _from_prev(x, k_lo, r)
    below = jnp.where(idx == 0, _edge(x, 0, k_lo), below)
    above = _from_next(x, k_hi, r)
    above = jnp.where(idx == r - 1, _edge(x, x.shape[1] - 1, k_hi), above)
    return below, above


def _sample_shift_local3d(field, disp_z, disp_y, disp_x, k, below, above):
    """shift_trilinear_sample_3d on a slab extended with z-halo planes.

    field: (B, Zk, H', W') local planes; below: (B, k, H', W') planes under
    the slab; above: (B, k+1, H', W') planes over it (the asymmetric window
    matches the dense path's offsets −k..k+1). The y/x axes are unsharded →
    plain edge pad; identical math to
    ops/interp3d.py::shift_trilinear_sample_3d.
    """
    zk, h, w = field.shape[1], field.shape[2], field.shape[3]
    disp_z = jnp.clip(disp_z, -k, k)
    disp_y = jnp.clip(disp_y, -k, k)
    disp_x = jnp.clip(disp_x, -k, k)
    ext = jnp.concatenate([below, field, above], axis=1)
    ext = jnp.pad(ext, ((0, 0), (0, 0), (k, k + 1), (k, k + 1)), mode="edge")
    out = jnp.zeros_like(field)
    for oz in range(-k, k + 2):
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(disp_z - oz))
        plane = lax.slice_in_dim(ext, k + oz, k + oz + zk, axis=1)
        for oy in range(-k, k + 2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(disp_y - oy))
            row = lax.slice_in_dim(plane, k + oy, k + oy + h, axis=2)
            for ox in range(-k, k + 2):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(disp_x - ox))
                val = lax.slice_in_dim(row, k + ox, k + ox + w, axis=3)
                out = out + val * (wz * wy * wx)
    return out


def _face_mean_y(c):
    """Centered (B, Zk, H, W) → y-faces (B, Zk, H+1, W), edge clamp (local)."""
    cp = jnp.pad(c, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    return 0.5 * (cp[:, :, :-1] + cp[:, :, 1:])


def _face_mean_x(c):
    """Centered (B, Zk, H, W) → x-faces (B, Zk, H, W+1), edge clamp (local)."""
    cp = jnp.pad(c, ((0, 0), (0, 0), (0, 0), (1, 1)), mode="edge")
    return 0.5 * (cp[:, :, :, :-1] + cp[:, :, :, 1:])


# ---------------------------------------------------------------------------
# Distributed pressure solve (runs INSIDE shard_map on local slabs).
# ---------------------------------------------------------------------------


class _PressureOps3D:
    """Distributed 3D pressure-solve closures over one rank's z-slab.

    The 3D analog of parallel/spatial.py::_PressureOps: gated operator,
    global-fluid-mean deflation, the distributed exact/preconditioned
    solves, and an iteration-reporting CG. All arguments are local
    (B, Zk, H, W) slabs / mask slabs plus replicated basis matrices.
    """

    def __init__(self, fluid, acc_z_lo, acc_above, acc_y, acc_x, idx, *,
                 r, dx, tol, maxiter, mode, qz, qy, qx, inv_lam):
        self.fluid, self.idx, self.r, self.dx = fluid, idx, r, dx
        self.acc_z_lo, self.acc_above = acc_z_lo, acc_above
        self.acc_y, self.acc_x = acc_y, acc_x
        self.tol, self.maxiter, self.mode = tol, maxiter, mode
        self.qz, self.qy, self.qx, self.inv_lam = qz, qy, qx, inv_lam
        self.n_fluid = jnp.maximum(lax.psum(jnp.sum(fluid), SPACE_AXIS), 1.0)

    def psum_dot(self, a, b):
        return lax.psum(jnp.sum(a * b, axis=(1, 2, 3), keepdims=True),
                        SPACE_AXIS)

    def project(self, p):
        mean = lax.psum(
            jnp.sum(p * self.fluid, axis=(1, 2, 3), keepdims=True),
            SPACE_AXIS) / self.n_fluid
        return jnp.where(self.fluid > 0, p - mean, p)

    def grad_p(self, p):
        """Gated ∇p: (gz_lo, gz_hi, gy, gx) — gz_hi is the slab's top
        z-face plane, needed by the divergence."""
        r, dx = self.r, self.dx
        p_prev = _from_prev(p, 1, r)   # rank 0: killed by the acc gate
        p_next = _from_next(p, 1, r)   # top rank: killed by the acc gate
        pm = jnp.concatenate([p_prev, p[:, :-1]], axis=1)
        gz_lo = (p - pm) / dx * self.acc_z_lo
        gz_hi = (p_next - p[:, -1:]) / dx * self.acc_above
        pyp = jnp.pad(p, ((0, 0), (0, 0), (1, 1), (0, 0)))
        gy = (pyp[:, :, 1:] - pyp[:, :, :-1]) / dx * self.acc_y
        pxp = jnp.pad(p, ((0, 0), (0, 0), (0, 0), (1, 1)))
        gx = (pxp[:, :, :, 1:] - pxp[:, :, :, :-1]) / dx * self.acc_x
        return gz_lo, gz_hi, gy, gx

    def matvec_raw(self, p):
        gz_lo, gz_hi, gy, gx = self.grad_p(p)
        lap = (jnp.concatenate([gz_lo[:, 1:], gz_hi], axis=1) - gz_lo
               + gy[:, :, 1:] - gy[:, :, :-1]
               + gx[:, :, :, 1:] - gx[:, :, :, :-1]) / self.dx
        return jnp.where(self.fluid > 0, -lap, p)

    def matvec(self, p):
        return self.project(self.matvec_raw(self.project(p)))

    def dist_spectral(self, rhs):
        """Distributed global 3D DCT-II Neumann pseudo-inverse apply.

        rhs: (B, Zk, H, W) slab → slab of pinv(A_neumann)·rhs, identical
        math to ops/spectral.py::spectral_neumann_solve_3d. The x- and
        y-axis basis matmuls are local (full W, H slab-resident); the
        z-axis matmul is distributed: per-slab partial products combined
        by `lax.psum_scatter` over 'space', scattering the y-MODE axis on
        the forward transform (so the eigenvalue multiply and the inverse
        z matmul are local in z) and scattering the z axis back to slabs
        via the y-mode-partial inverse — two reduce-scatters of the field
        per apply, all matmul FLOPs sharded 1/r.
        """
        qz, qy, qx, inv_lam, idx = (self.qz, self.qy, self.qx, self.inv_lam,
                                    self.idx)
        zk = rhs.shape[1]
        mk = qy.shape[0] // self.r          # y-mode block height (H / r)
        # forward x (local) then y (local): w→l, h→m
        c = jnp.einsum("lw,bdhw->bdhl", qx, rhs, precision=_PRECISION,
                       preferred_element_type=jnp.float32)
        c = jnp.einsum("mh,bdhl->bdml", qy, c, precision=_PRECISION,
                       preferred_element_type=jnp.float32)
        # forward z (distributed): partial over my slab planes
        qz_blk = lax.dynamic_slice_in_dim(qz, idx * zk, zk, axis=1)
        part = jnp.einsum("zd,bdml->bzml", qz_blk, c, precision=_PRECISION,
                          preferred_element_type=jnp.float32)
        spec = lax.psum_scatter(part, SPACE_AXIS, scatter_dimension=2,
                                tiled=True)             # (B, D, H/r, W)
        lam_blk = lax.dynamic_slice_in_dim(inv_lam, idx * mk, mk, axis=1)
        spec = spec * lam_blk[None]
        # inverse z (local: full D resident)
        sp = jnp.einsum("zd,bzml->bdml", qz, spec, precision=_PRECISION,
                        preferred_element_type=jnp.float32)
        # inverse y (distributed): partial over my y-mode block — the
        # psum_scatter along z simultaneously restores the slab layout
        qy_blk = lax.dynamic_slice_in_dim(qy, idx * mk, mk, axis=0)
        part2 = jnp.einsum("mh,bdml->bdhl", qy_blk, sp, precision=_PRECISION,
                           preferred_element_type=jnp.float32)
        out = lax.psum_scatter(part2, SPACE_AXIS, scatter_dimension=1,
                               tiled=True)              # (B, Zk, H, W)
        # inverse x (local)
        return jnp.einsum("lw,bdhl->bdhw", qx, out, precision=_PRECISION,
                          preferred_element_type=jnp.float32)

    def precond(self, res):
        # Deflated: P ∘ M⁻¹ ∘ P stays SPD on the compatible subspace.
        return self.project(self.dist_spectral(self.project(res)))

    def cg_solve(self, rhs, guess):
        """Distributed (preconditioned) CG; returns (x_best, iterations).
        Same safeguards as the 2D _PressureOps.cg_solve (per-sample
        freeze via the rs/rs_best gate, best-iterate tracking, mesh-
        uniform trip count)."""
        matvec, psum_dot = self.matvec, self.psum_dot
        apply_m = self.precond if self.mode == "pcg" else (lambda res: res)
        x = jnp.zeros_like(rhs) if guess is None else guess
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
                # Exact; projection INSIDE the solve (backward cotangents
                # carry a nullspace component — numerics invariant).
                return self.project(self.dist_spectral(self.project(rhs)))

            return solve

        def solve(mv, rhs):
            return self.cg_solve(
                self.project(rhs),
                None if guess is None else self.project(guess))[0]

        return solve


# ---------------------------------------------------------------------------
# The shard_map'ed 3D fluid step.
# ---------------------------------------------------------------------------


def spatial_fluid3d_step(
    state: FluidState3D,
    domain: Domain3D,
    cfg: Fluid3DConfig,
    mesh: Mesh,
    force: Staggered3D | None = None,
    buoyancy_factor: jnp.ndarray | None = None,
) -> FluidState3D:
    """One fluid3d_step with every field sharded along z over mesh axis
    'space' (and the batch over 'data'). Same semantics as
    physics/fluid3d.py::fluid3d_step for the supported scope: closed
    domain, viscosity 0, shift advection. Pressure backends: 'auto' →
    exact distributed spectral solve without obstacles / distributed
    spectral-PCG with them; explicit 'spectral' / 'pcg' / 'jax'.

    `buoyancy_factor` may be (B, 1, 1, 1) (replicated over space) or a
    full (B, D, H, W) centered field (sharded) — the 3D indirect-control
    channel. Call under jit (cfg/mesh static); inputs may live anywhere —
    jit reshards at the shard_map boundary.
    """
    if not domain.closed:
        raise ValueError("spatial_fluid3d_step supports closed domains only "
                         "(the dropped global top z-face is identically "
                         "zero only under wall boundaries)")
    if cfg.viscosity:
        raise ValueError("spatial_fluid3d_step: viscosity not implemented")
    if cfg.advection_mode != "shift":
        raise ValueError("spatial_fluid3d_step requires shift advection")
    mode = cfg.pressure_backend
    if mode == "auto":
        mode = "pcg" if domain.has_obstacles else "spectral"
    if mode == "spectral" and domain.has_obstacles:
        raise ValueError("'spectral' is exact only for domains without "
                         "obstacles; use 'pcg' (preconditioned CG)")
    if mode not in ("spectral", "pcg", "jax"):
        raise ValueError(f"unknown pressure backend {cfg.pressure_backend!r}")
    r = mesh.shape[SPACE_AXIS]
    d, h, w = domain.grid_shape
    k = int(cfg.max_shift)
    if d % r:
        raise ValueError(f"D={d} not divisible by space axis size {r}")
    if mode != "jax" and h % r:
        raise ValueError(f"H={h} not divisible by space axis size {r} "
                         "(the distributed 3D spectral transform reduce-"
                         "scatters along the y-mode axis); use "
                         "pressure_backend='jax'")
    if d // r < k + 2:
        raise ValueError(f"slab of {d // r} planes < max_shift+2={k + 2}; "
                         "use fewer space shards or a deeper grid")
    dt, dx = cfg.dt, domain.dx
    tol, maxiter = cfg.pressure_tol, cfg.pressure_maxiter
    if mode != "jax":
        qz = jnp.asarray(_dct_matrix(d))
        qy = jnp.asarray(_dct_matrix(h))
        qx = jnp.asarray(_dct_matrix(w))
        inv_lam = jnp.asarray(_inv_neumann_eigenvalues_3d(d, h, w, dx))
    else:
        qz = qy = qx = inv_lam = None

    def local_step(vz_lo, vz_top, vy, vx, density, inflow, x0,
                   fz_lo, fy, fx, buoy, fluid, acc_z_lo, acc_z_top,
                   acc_y, acc_x, qz, qy, qx, inv_lam):
        idx = lax.axis_index(SPACE_AXIS)
        top = idx == r - 1

        def from_next_face(x_lo, x_top, planes):
            """Planes above a lower-face slab: the next rank's leading
            planes; at the top rank, the real global top face replicated
            (the dense path's edge clamp beyond face D)."""
            nxt = _from_next(x_lo, planes, r)
            fill = jnp.broadcast_to(
                x_top, (x_lo.shape[0], planes) + x_lo.shape[2:])
            return jnp.where(top, fill, nxt)

        # --- advection (matches fluid3d_step order: density, then v) -----
        vz_above1 = from_next_face(vz_lo, vz_top, 1)
        vz_c = 0.5 * (vz_lo + jnp.concatenate([vz_lo[:, 1:], vz_above1],
                                              axis=1))
        vy_c = 0.5 * (vy[:, :, :-1] + vy[:, :, 1:])
        vx_c = 0.5 * (vx[:, :, :, :-1] + vx[:, :, :, 1:])
        s = -dt / dx

        d_below, d_above = _halos_cell(density, k, k + 1, r, idx)
        density_new = _sample_shift_local3d(
            density, s * vz_c, s * vy_c, s * vx_c, k, d_below, d_above)
        if inflow is not None:
            density_new = density_new + dt * inflow

        def prev_cell(c):
            pc = _from_prev(c, 1, r)
            return jnp.where(idx == 0, c[:, :1], pc)

        # vz at z-faces: native vz; vy/vx center fields resampled to
        # z-faces (prev cell plane), as centered_to_z_faces' edge clamp.
        vy_at_z = 0.5 * (jnp.concatenate([prev_cell(vy_c), vy_c[:, :-1]],
                                         axis=1) + vy_c)
        vx_at_z = 0.5 * (jnp.concatenate([prev_cell(vx_c), vx_c[:, :-1]],
                                         axis=1) + vx_c)
        vz_below = _from_prev(vz_lo, k, r)
        vz_below = jnp.where(idx == 0, _edge(vz_lo, 0, k), vz_below)
        vz_above = from_next_face(vz_lo, vz_top, k + 1)
        vz_new = _sample_shift_local3d(
            vz_lo, s * vz_lo, s * vy_at_z, s * vx_at_z, k,
            vz_below, vz_above)

        # vy at y-faces: vz_c/vx_c resampled along y (local edge pad).
        vz_at_y = _face_mean_y(vz_c)
        vx_at_y = _face_mean_y(vx_c)
        vy_below, vy_above = _halos_cell(vy, k, k + 1, r, idx)
        vy_new = _sample_shift_local3d(
            vy, s * vz_at_y, s * vy, s * vx_at_y, k, vy_below, vy_above)

        # vx at x-faces: vz_c/vy_c resampled along x (local edge pad).
        vz_at_x = _face_mean_x(vz_c)
        vy_at_x = _face_mean_x(vy_c)
        vx_below, vx_above = _halos_cell(vx, k, k + 1, r, idx)
        vx_new = _sample_shift_local3d(
            vx, s * vz_at_x, s * vy_at_x, s * vx, k, vx_below, vx_above)

        # --- forces / buoyancy (on the ADVECTED density, as in 3D step) --
        # The force's global top z-face component is dropped along with
        # the velocity's: on closed domains the dense step's projection
        # masks that face to zero (acc_z top row is a wall), so it never
        # affects the state — verified by the dense-pinning tests.
        if fz_lo is not None:
            vz_new = vz_new + dt * fz_lo
            vy_new = vy_new + dt * fy
            vx_new = vx_new + dt * fx
        b = cfg.buoyancy if buoy is None else buoy

        def to_z_faces(c):
            """Centered → lower z-faces: 0.5·(c[k−1] + c[k]) with the
            dense path's edge clamp at the global bottom (prev_cell)."""
            return 0.5 * (jnp.concatenate([prev_cell(c), c[:, :-1]],
                                          axis=1) + c)

        if buoy is not None or cfg.buoyancy:
            if buoy_full:
                # Full (B, D, H, W) factor: weight at centers, THEN
                # face-resample — matches fluid3d_step's full-field branch.
                vz_new = vz_new + dt * to_z_faces(buoy * density_new)
            else:
                vz_new = vz_new + dt * b * to_z_faces(density_new)

        # --- projection: mask, divergence, solve, correct ----------------
        vz_m = vz_new * acc_z_lo
        vy_m = vy_new * acc_y
        vx_m = vx_new * acc_x
        vz_m_above = from_next_face(vz_m, jnp.zeros_like(vz_top), 1)
        div = (jnp.concatenate([vz_m[:, 1:], vz_m_above], axis=1) - vz_m
               + vy_m[:, :, 1:] - vy_m[:, :, :-1]
               + vx_m[:, :, :, 1:] - vx_m[:, :, :, :-1]) / dx

        acc_above = from_next_face(acc_z_lo[None], acc_z_top[None], 1)[0]
        ops = _PressureOps3D(
            fluid, acc_z_lo, acc_above, acc_y, acc_x, idx, r=r, dx=dx,
            tol=tol, maxiter=maxiter, mode=mode, qz=qz, qy=qy, qx=qx,
            inv_lam=inv_lam)

        rhs = jnp.where(fluid > 0, -div, 0.0)
        guess = None if x0 is None else lax.stop_gradient(x0)
        if mode == "spectral":
            guess = None
        p = lax.custom_linear_solve(
            ops.matvec, rhs, solve=ops.make_solve(guess), symmetric=True,
            transpose_solve=(ops.make_solve(None)
                             if guess is not None else None))

        gz_lo, _, gy, gx = ops.grad_p(p)
        return vz_m - gz_lo, vy_m - gy, vx_m - gx, density_new, p

    # ---- assemble specs and run ------------------------------------------
    bspec = P(DATA_AXIS, SPACE_AXIS, None, None)  # batched, z-sharded
    tspec = P(DATA_AXIS, None, None, None)        # batched, replicated tops
    mspec = P(SPACE_AXIS, None, None)             # unbatched mask slabs
    rspec = P()                                   # replicated

    vz_lo = state.velocity.vz[:, :-1]
    vz_top = state.velocity.vz[:, -1:]
    has_force = force is not None
    fz_lo = force.vz[:, :-1] if has_force else None
    fy = force.vy if has_force else None
    fx = force.vx if has_force else None
    buoy = buoyancy_factor
    buoy_full = (buoy is not None and getattr(buoy, "ndim", 0) >= 4
                 and buoy.shape[1] == state.density.shape[1])
    inflow = state.inflow
    if inflow is not None and inflow.ndim == 3:
        inflow = jnp.broadcast_to(inflow[None], state.density.shape)
    x0 = state.pressure

    args = (vz_lo, vz_top, state.velocity.vy, state.velocity.vx,
            state.density, inflow, x0, fz_lo, fy, fx, buoy,
            domain.fluid_mask, domain.acc_z[:-1], domain.acc_z[-1:],
            domain.acc_y, domain.acc_x, qz, qy, qx, inv_lam)
    specs = (bspec, tspec, bspec, bspec, bspec,
             bspec if inflow is not None else None,
             bspec if x0 is not None else None,
             bspec if has_force else None,
             bspec if has_force else None,
             bspec if has_force else None,
             (bspec if buoy_full else tspec) if buoy is not None else None,
             mspec, mspec, rspec, mspec, mspec,
             rspec if qz is not None else None,
             rspec if qy is not None else None,
             rspec if qx is not None else None,
             rspec if inv_lam is not None else None)
    in_specs = tuple(s for s, a in zip(specs, args) if a is not None)
    live = tuple(a for a in args if a is not None)
    mask = tuple(a is not None for a in args)

    def wrapper(*live_args):
        it = iter(live_args)
        full = tuple(next(it) if m else None for m in mask)
        return local_step(*full)

    vz_lo2, vy2, vx2, density2, p2 = shard_map(
        wrapper, mesh=mesh, in_specs=in_specs,
        out_specs=(bspec, bspec, bspec, bspec, bspec), check_vma=False)(*live)

    vz2 = jnp.concatenate(
        [vz_lo2, jnp.zeros_like(state.velocity.vz[:, -1:])], axis=1)
    return FluidState3D(
        velocity=Staggered3D(vz=vz2, vy=vy2, vx=vx2), density=density2,
        inflow=state.inflow,
        pressure=p2 if state.pressure is not None else None)


def spatial_pressure_solve3d_diag(
    div: jnp.ndarray,
    domain: Domain3D,
    mesh: Mesh,
    mode: str = "pcg",
    tol: float = 1e-5,
    maxiter: int = 500,
):
    """Diagnostic distributed 3D pressure solve: returns (p, iterations).

    The 3D analog of spatial_pressure_solve_diag — same math as the
    in-step _PressureOps3D, run OUTSIDE custom_linear_solve so the CG
    trip count escapes. div: (B, D, H, W).
    """
    if mode == "spectral" and domain.has_obstacles:
        raise ValueError("'spectral' is exact only without obstacles")
    r = mesh.shape[SPACE_AXIS]
    d, h, w = domain.grid_shape
    if d % r or (mode != "jax" and h % r):
        raise ValueError(f"grid {d}x{h}x{w} not divisible by space={r}")
    dx = domain.dx
    if mode != "jax":
        qz = jnp.asarray(_dct_matrix(d))
        qy = jnp.asarray(_dct_matrix(h))
        qx = jnp.asarray(_dct_matrix(w))
        inv_lam = jnp.asarray(_inv_neumann_eigenvalues_3d(d, h, w, dx))
    else:
        qz = qy = qx = inv_lam = None

    def local(div, fluid, acc_z_lo, acc_z_top, acc_y, acc_x, *spectral):
        idx = lax.axis_index(SPACE_AXIS)
        nxt = _from_next(acc_z_lo[None], 1, r)
        acc_above = jnp.where(idx == r - 1, acc_z_top[None], nxt)[0]
        qz_, qy_, qx_, lam_ = spectral if spectral else (None,) * 4
        ops = _PressureOps3D(fluid, acc_z_lo, acc_above, acc_y, acc_x, idx,
                             r=r, dx=dx, tol=tol, maxiter=maxiter,
                             mode=mode, qz=qz_, qy=qy_, qx=qx_,
                             inv_lam=lam_)
        rhs = ops.project(jnp.where(fluid > 0, -div, 0.0))
        if mode == "spectral":
            return ops.project(ops.dist_spectral(rhs)), jnp.int32(0)
        return ops.cg_solve(rhs, None)

    bspec = P(DATA_AXIS, SPACE_AXIS, None, None)
    mspec = P(SPACE_AXIS, None, None)
    rspec = P()
    args = [div, domain.fluid_mask, domain.acc_z[:-1], domain.acc_z[-1:],
            domain.acc_y, domain.acc_x]
    specs = [bspec, mspec, mspec, rspec, mspec, mspec]
    if mode != "jax":
        args += [qz, qy, qx, inv_lam]
        specs += [rspec, rspec, rspec, rspec]
    p, iters = shard_map(local, mesh=mesh, in_specs=tuple(specs),
                         out_specs=(bspec, rspec), check_vma=False)(*args)
    return p, iters
