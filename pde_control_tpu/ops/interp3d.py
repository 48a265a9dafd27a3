"""Trilinear field sampling — the 3D semi-Lagrangian advection core.

Extends ops/interp.py to volumes, same two formulations:

  * ``trilinear_sample_3d`` — gather-based sampling at arbitrary
    coordinates (correctness oracle).
  * ``shift_trilinear_sample_3d`` — the TPU-fast path: CFL-bounded
    displacements as a weighted sum over a static window of shifted copies
    (pad/slice/elementwise only — zero gathers; XLA fuses the (2K+2)³
    terms into one VPU kernel). In 3D the window grows as the CUBE of the
    CFL bound, so the default ``max_shift`` is 1 (64 terms; K=2 would be
    216) — keep |v·dt/dx| ≤ 1, standard for smoke.

Coordinate convention: value ``field[..., k, i, j]`` sits at
``(z=k, y=i, x=j)`` in grid-index units.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from pde_control_tpu.ops.interp import _wrap_or_clip


def trilinear_sample_3d(
    field: jnp.ndarray,
    z: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    boundary: str = "clamp",
) -> jnp.ndarray:
    """Sample a batched 3D field at fractional coordinates (gather-based).

    Args:
      field: (B, D, H, W); field[b, k, i, j] at (z=k, y=i, x=j).
      z, y, x: (B, ...) sample coordinates (same trailing shape).
      boundary: 'periodic' or 'clamp'.
    Returns: (B, ...) sampled values.
    """
    b, d, h, w = field.shape
    out_shape = z.shape
    z = z.reshape(b, -1)
    y = y.reshape(b, -1)
    x = x.reshape(b, -1)
    z0f, y0f, x0f = jnp.floor(z), jnp.floor(y), jnp.floor(x)
    fz, fy, fx = z - z0f, y - y0f, x - x0f
    z0 = z0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    flat = field.reshape(b, d * h * w)

    def gather(iz, iy, ix):
        iz = _wrap_or_clip(iz, d, boundary)
        iy = _wrap_or_clip(iy, h, boundary)
        ix = _wrap_or_clip(ix, w, boundary)
        return jnp.take_along_axis(flat, (iz * h + iy) * w + ix, axis=-1)

    out = jnp.zeros_like(fz)
    for oz in (0, 1):
        wz = fz if oz else (1.0 - fz)
        for oy in (0, 1):
            wy = fy if oy else (1.0 - fy)
            for ox in (0, 1):
                wx = fx if ox else (1.0 - fx)
                out = out + gather(z0 + oz, y0 + oy, x0 + ox) * (wz * wy * wx)
    return out.reshape(b, *out_shape[1:]) if len(out_shape) > 1 else out


def _pad3(field: jnp.ndarray, k: int, boundary: str) -> jnp.ndarray:
    mode = "wrap" if boundary == "periodic" else "edge"
    pad = [(0, 0)] * (field.ndim - 3) + [(k, k + 1)] * 3
    return jnp.pad(field, pad, mode=mode)


def shift_trilinear_sample_3d(
    field: jnp.ndarray,
    disp_z: jnp.ndarray,
    disp_y: jnp.ndarray,
    disp_x: jnp.ndarray,
    max_shift: int = 1,
    boundary: str = "clamp",
) -> jnp.ndarray:
    """Trilinear sample at ``grid + displacement`` without gathers.

    out[k,i,j] = trilerp(field, k+disp_z, i+disp_y, j+disp_x) assuming
    |disp| ≤ max_shift (clipped to that bound): a sum over static integer
    offsets of shifted-field × hat-weight products, exactly as the 2D
    shift formulation (ops/interp.py::shift_bilinear_sample_2d).

    Args:
      field: (B, D, H, W).
      disp_z/y/x: (B, D, H, W) displacements in cells.
      max_shift: CFL bound K on |displacement| (window is (2K+2)³ terms).
      boundary: 'clamp' or 'periodic'.
    """
    k = int(max_shift)
    disp_z = jnp.clip(disp_z, -k, k)
    disp_y = jnp.clip(disp_y, -k, k)
    disp_x = jnp.clip(disp_x, -k, k)
    fp = _pad3(field, k, boundary)
    d, h, w = field.shape[-3], field.shape[-2], field.shape[-1]
    out = jnp.zeros_like(field)
    for oz in range(-k, k + 2):
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(disp_z - oz))
        plane = lax.slice_in_dim(fp, k + oz, k + oz + d, axis=-3)
        for oy in range(-k, k + 2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(disp_y - oy))
            row = lax.slice_in_dim(plane, k + oy, k + oy + h, axis=-2)
            for ox in range(-k, k + 2):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(disp_x - ox))
                val = lax.slice_in_dim(row, k + ox, k + ox + w, axis=-1)
                out = out + val * (wz * wy * wx)
    return out
