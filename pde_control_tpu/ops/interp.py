"""Linear/bilinear field sampling — the semi-Lagrangian advection core.

Replaces `phi/physics/field/advect.py :: semi_lagrangian`'s resampling [R]
(SURVEY.md L2). Two formulations:

  * ``linear_sample_1d`` / ``bilinear_sample_2d`` — general gather-based
    sampling at arbitrary coordinates (correctness oracle; fine for 1D and
    for host-side dataset generation).
  * ``shift_bilinear_sample_2d`` — the TPU-fast path: when sample points are
    ``grid + displacement`` with ``|displacement| <= max_shift`` cells (the
    CFL-bounded semi-Lagrangian case), bilinear interpolation is a weighted
    sum over a small static window of *shifted copies* of the field. That is
    pure pad/slice/elementwise arithmetic — no gather — which XLA fuses into
    one VPU kernel (SURVEY.md §7 hard-part 3: "TPU hates dynamic gather").

Coordinate convention: value ``field[..., i, j]`` sits at coordinate
``(y=i, x=j)`` (grid-index units; multiply by dx outside if needed).

Boundary modes: ``clamp`` (edge replicate — PhiFlow-style open/closed domain
sampling) and ``periodic``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _wrap_or_clip(idx: jnp.ndarray, n: int, boundary: str) -> jnp.ndarray:
    if boundary == "periodic":
        return jnp.mod(idx, n)
    if boundary == "clamp":
        return jnp.clip(idx, 0, n - 1)
    raise ValueError(f"unknown sampling boundary {boundary!r}")


def linear_sample_1d(
    field: jnp.ndarray, x: jnp.ndarray, boundary: str = "periodic"
) -> jnp.ndarray:
    """Sample a batched 1D field at fractional coordinates.

    Args:
      field: (B, N) values; field[b, i] at coordinate i.
      x: (B, M) fractional sample coordinates.
      boundary: 'periodic' or 'clamp'.
    Returns: (B, M) sampled values.
    """
    n = field.shape[-1]
    x0 = jnp.floor(x)
    f = x - x0
    i0 = _wrap_or_clip(x0.astype(jnp.int32), n, boundary)
    i1 = _wrap_or_clip(x0.astype(jnp.int32) + 1, n, boundary)
    v0 = jnp.take_along_axis(field, i0, axis=-1)
    v1 = jnp.take_along_axis(field, i1, axis=-1)
    return v0 * (1.0 - f) + v1 * f


def bilinear_sample_2d(
    field: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    boundary: str = "clamp",
) -> jnp.ndarray:
    """Sample a batched 2D field at fractional coordinates (gather-based).

    Args:
      field: (B, H, W); field[b, i, j] at coordinate (y=i, x=j).
      y, x: (B, ...) sample coordinates (same trailing shape).
      boundary: 'periodic' or 'clamp'.
    Returns: (B, ...) sampled values.
    """
    b, h, w = field.shape
    out_shape = y.shape
    y = y.reshape(b, -1)
    x = x.reshape(b, -1)
    y0f = jnp.floor(y)
    x0f = jnp.floor(x)
    fy = y - y0f
    fx = x - x0f
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    flat = field.reshape(b, h * w)

    def gather(iy, ix):
        iy = _wrap_or_clip(iy, h, boundary)
        ix = _wrap_or_clip(ix, w, boundary)
        return jnp.take_along_axis(flat, iy * w + ix, axis=-1)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    return out.reshape(b, *out_shape[1:]) if len(out_shape) > 1 else out


def _pad2(field: jnp.ndarray, k: int, boundary: str) -> jnp.ndarray:
    mode = "wrap" if boundary == "periodic" else "edge"
    pad = [(0, 0)] * (field.ndim - 2) + [(k, k + 1), (k, k + 1)]
    return jnp.pad(field, pad, mode=mode)


def shift_bilinear_sample_2d(
    field: jnp.ndarray,
    disp_y: jnp.ndarray,
    disp_x: jnp.ndarray,
    max_shift: int = 2,
    boundary: str = "clamp",
) -> jnp.ndarray:
    """Bilinear sample at ``grid + displacement`` without gathers.

    out[i,j] = bilerp(field, i + disp_y[i,j], j + disp_x[i,j]) assuming
    |disp| <= max_shift (displacement is clipped to that bound). Computed as
    Σ over static integer offsets (oy, ox) of shifted-field × hat-weights —
    (2K+2)² fused elementwise terms, zero gathers. Exact match with the
    gather path for in-bound displacements (up to fp association order).

    Args:
      field: (B, H, W).
      disp_y, disp_x: (B, H, W) displacement in cells.
      max_shift: CFL bound K on |displacement|.
      boundary: 'clamp' or 'periodic'.
    """
    k = int(max_shift)
    disp_y = jnp.clip(disp_y, -k, k)
    disp_x = jnp.clip(disp_x, -k, k)
    fp = _pad2(field, k, boundary)
    h, w = field.shape[-2], field.shape[-1]
    out = jnp.zeros_like(field)
    for oy in range(-k, k + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(disp_y - oy))
        row = lax.slice_in_dim(fp, k + oy, k + oy + h, axis=-2)
        for ox in range(-k, k + 2):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(disp_x - ox))
            val = lax.slice_in_dim(row, k + ox, k + ox + w, axis=-1)
            out = out + val * (wy * wx)
    return out
