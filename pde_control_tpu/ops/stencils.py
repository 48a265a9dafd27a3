"""Finite-difference stencils as shifted-slice arithmetic.

Replaces `phi/math/nd.py :: laplace / gradient` [R] (SURVEY.md §1 L0). All ops
are batched (leading axes untouched), static-shaped, and built from `jnp.pad` +
slicing so XLA lowers them to fused VPU elementwise code on TPU — no gathers.

Boundary modes:
  * ``periodic``  — wrap.
  * ``neumann``   — zero normal derivative (edge replicate).
  * ``dirichlet`` — zero value outside (zero pad).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_PAD_MODE = {
    "periodic": "wrap",
    "neumann": "edge",
    "dirichlet": "constant",
}


def pad_edge(u: jnp.ndarray, axis: int, boundary: str) -> jnp.ndarray:
    """Pad one cell on both sides of `axis` according to `boundary`."""
    if boundary not in _PAD_MODE:
        raise ValueError(f"unknown boundary {boundary!r}")
    pad = [(0, 0)] * u.ndim
    pad[axis] = (1, 1)
    return jnp.pad(u, pad, mode=_PAD_MODE[boundary])


def _shift_diff2(u: jnp.ndarray, axis: int, boundary: str) -> jnp.ndarray:
    """u[i+1] + u[i-1] - 2 u[i] along `axis` with boundary handling.

    Uses static `lax.slice_in_dim` (not gather) so XLA keeps it on the VPU.
    """
    up = pad_edge(u, axis, boundary)
    n = u.shape[axis]
    lo = lax.slice_in_dim(up, 0, n, axis=axis)      # u[i-1]
    hi = lax.slice_in_dim(up, 2, n + 2, axis=axis)  # u[i+1]
    return lo + hi - 2.0 * u


def laplace(
    u: jnp.ndarray,
    dx: float = 1.0,
    boundary: str = "periodic",
    axes: tuple[int, ...] | None = None,
) -> jnp.ndarray:
    """Discrete Laplacian Σ_ax (u[i+1]+u[i-1]-2u[i])/dx² over spatial `axes`.

    `axes` defaults to all axes except axis 0 (the batch axis).
    """
    if axes is None:
        axes = tuple(range(1, u.ndim))
    out = jnp.zeros_like(u)
    for ax in axes:
        out = out + _shift_diff2(u, ax, boundary)
    return out / (dx * dx)
