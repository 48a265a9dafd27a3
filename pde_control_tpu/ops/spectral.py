"""Spectral (DCT-based) Poisson solves — the fast path for the pressure
projection on obstacle-free domains, and the preconditioner elsewhere.

The cell-centered Neumann (closed-wall) Laplacian is diagonal in the DCT-II
basis: eigenvalue 2cos(πk/N)−2 per axis, so the pressure-Poisson system is
solved EXACTLY in one forward + one inverse transform.

TPU-native choice: the transforms are **matmuls against the orthonormal
DCT-II basis matrix** (X = Q_h · x · Q_wᵀ), not FFTs. At the grid sizes this
framework targets (N ≤ 256) the O(N³) batched matmul rides the MXU and
beats FFT launch overhead — and the axon TPU backend's FFT is only
partially implemented (jax.scipy.fft.dctn and small rfft sizes raise
UNIMPLEMENTED), while dot products are the best-supported path on any TPU.

Reference parity note: PhiFlow 1.x ships an FFT Poisson option and a
multiscale solver [R] (SURVEY.md §2b 'pressure solvers'); this is the
TPU-native analog.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis Q, rows = frequencies: Q @ Q.T = I."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    q = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    q[0] *= np.sqrt(1.0 / n)
    q[1:] *= np.sqrt(2.0 / n)
    return q.astype(np.float32)


# Full fp32 matmuls: the TPU MXU's default bf16 input truncation is fatal
# here — the solve divides by eigenvalues down to (π/N)², amplifying the
# ~0.4% bf16 error to O(1) solution error (measured residual 0.36 at 64²).
_PRECISION = jax.lax.Precision.HIGHEST


def dct2_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2D DCT-II over the last two axes (B, H, W) → (B, H, W)."""
    qh = jnp.asarray(_dct_matrix(x.shape[-2]))
    qw = jnp.asarray(_dct_matrix(x.shape[-1]))
    return jnp.einsum("kh,bhw,lw->bkl", qh, x, qw, precision=_PRECISION,
                      preferred_element_type=jnp.float32)


def idct2_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `dct2_2d` (transpose of the orthonormal transform)."""
    qh = jnp.asarray(_dct_matrix(x.shape[-2]))
    qw = jnp.asarray(_dct_matrix(x.shape[-1]))
    return jnp.einsum("kh,bkl,lw->bhw", qh, x, qw, precision=_PRECISION,
                      preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=32)
def _inv_neumann_eigenvalues(h: int, w: int, dx: float) -> np.ndarray:
    """1/eigenvalues of A = −∇²_neumann/dx² in the DCT-II basis, (H, W);
    the (0,0) nullspace mode maps to 0 (pseudo-inverse)."""
    ky = 2.0 - 2.0 * np.cos(np.pi * np.arange(h) / h)
    kx = 2.0 - 2.0 * np.cos(np.pi * np.arange(w) / w)
    lam = (ky[:, None] + kx[None, :]) / (dx * dx)
    lam[0, 0] = np.inf  # constant nullspace → 1/λ = 0
    return (1.0 / lam).astype(np.float32)


def spectral_neumann_solve(b: jnp.ndarray, dx: float = 1.0) -> jnp.ndarray:
    """Exact (pseudo-inverse) solve of A p = b, A = −∇² with Neumann BC.

    b: (B, H, W) or (B, D, H, W) (dispatches to the 3D solve), assumed
    zero-mean (compatible); returns the zero-mean p.
    """
    if b.ndim == 4:
        return spectral_neumann_solve_3d(b, dx)
    h, w = b.shape[-2], b.shape[-1]
    inv_lam = jnp.asarray(_inv_neumann_eigenvalues(h, w, dx))
    return idct2_2d(dct2_2d(b) * inv_lam)


@functools.lru_cache(maxsize=32)
def _dst_matrix(n: int) -> np.ndarray:
    """Orthonormal DST-I basis: Q[k,i] = √(2/(N+1))·sin(π(k+1)(i+1)/(N+1)).
    Symmetric and involutory (Q = Qᵀ = Q⁻¹)."""
    k = np.arange(1, n + 1)[:, None]
    i = np.arange(1, n + 1)[None, :]
    q = np.sqrt(2.0 / (n + 1)) * np.sin(np.pi * k * i / (n + 1))
    return q.astype(np.float32)


def dst1_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2D DST-I over the last two axes (involutory)."""
    qh = jnp.asarray(_dst_matrix(x.shape[-2]))
    qw = jnp.asarray(_dst_matrix(x.shape[-1]))
    return jnp.einsum("kh,bhw,lw->bkl", qh, x, qw, precision=_PRECISION,
                      preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=32)
def _inv_dirichlet_eigenvalues(h: int, w: int, dx: float) -> np.ndarray:
    """1/eigenvalues of A = −∇²_dirichlet/dx² (zero ghost cells) in the
    DST-I basis — nonsingular, so a true inverse."""
    ky = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, h + 1) / (h + 1))
    kx = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, w + 1) / (w + 1))
    lam = (ky[:, None] + kx[None, :]) / (dx * dx)
    return (1.0 / lam).astype(np.float32)


def spectral_dirichlet_solve(b: jnp.ndarray, dx: float = 1.0) -> jnp.ndarray:
    """Exact solve of A p = b, A = −∇² with Dirichlet (open-wall, ghost
    p = 0) BC — the open-domain pressure operator. b: (B, H, W) or
    (B, D, H, W) (dispatches to the 3D solve)."""
    if b.ndim == 4:
        return spectral_dirichlet_solve_3d(b, dx)
    h, w = b.shape[-2], b.shape[-1]
    inv_lam = jnp.asarray(_inv_dirichlet_eigenvalues(h, w, dx))
    return dst1_2d(dst1_2d(b) * inv_lam)


# ---------------------------------------------------------------- 3D solves
# Volume analogs (b: (B, D, H, W)): the separable eigenstructure extends
# directly — three sequential basis matmuls per transform, still MXU-ridden.
# The 2D entry points dispatch here on ndim, so physics/poisson.py uses one
# name per boundary condition regardless of dimension.


def _apply_axes_3d(x: jnp.ndarray, qd, qh, qw) -> jnp.ndarray:
    x = jnp.einsum("kd,bdhw->bkhw", qd, x, precision=_PRECISION,
                   preferred_element_type=jnp.float32)
    x = jnp.einsum("lh,bkhw->bklw", qh, x, precision=_PRECISION,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("mw,bklw->bklm", qw, x, precision=_PRECISION,
                      preferred_element_type=jnp.float32)


def dct2_3d(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 3D DCT-II over the last three axes."""
    return _apply_axes_3d(x, jnp.asarray(_dct_matrix(x.shape[-3])),
                          jnp.asarray(_dct_matrix(x.shape[-2])),
                          jnp.asarray(_dct_matrix(x.shape[-1])))


def idct2_3d(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `dct2_3d` (transpose of the orthonormal transform)."""
    qd = jnp.asarray(_dct_matrix(x.shape[-3])).T
    qh = jnp.asarray(_dct_matrix(x.shape[-2])).T
    qw = jnp.asarray(_dct_matrix(x.shape[-1])).T
    return _apply_axes_3d(x, qd, qh, qw)


@functools.lru_cache(maxsize=32)
def _inv_neumann_eigenvalues_3d(d: int, h: int, w: int,
                                dx: float) -> np.ndarray:
    kz = 2.0 - 2.0 * np.cos(np.pi * np.arange(d) / d)
    ky = 2.0 - 2.0 * np.cos(np.pi * np.arange(h) / h)
    kx = 2.0 - 2.0 * np.cos(np.pi * np.arange(w) / w)
    lam = (kz[:, None, None] + ky[None, :, None] + kx[None, None, :]) / (
        dx * dx)
    lam[0, 0, 0] = np.inf  # constant nullspace → 1/λ = 0
    return (1.0 / lam).astype(np.float32)


def spectral_neumann_solve_3d(b: jnp.ndarray, dx: float = 1.0) -> jnp.ndarray:
    d, h, w = b.shape[-3], b.shape[-2], b.shape[-1]
    inv_lam = jnp.asarray(_inv_neumann_eigenvalues_3d(d, h, w, dx))
    return idct2_3d(dct2_3d(b) * inv_lam)


def dst1_3d(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 3D DST-I over the last three axes (involutory)."""
    return _apply_axes_3d(x, jnp.asarray(_dst_matrix(x.shape[-3])),
                          jnp.asarray(_dst_matrix(x.shape[-2])),
                          jnp.asarray(_dst_matrix(x.shape[-1])))


@functools.lru_cache(maxsize=32)
def _inv_dirichlet_eigenvalues_3d(d: int, h: int, w: int,
                                  dx: float) -> np.ndarray:
    kz = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, d + 1) / (d + 1))
    ky = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, h + 1) / (h + 1))
    kx = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, w + 1) / (w + 1))
    lam = (kz[:, None, None] + ky[None, :, None] + kx[None, None, :]) / (
        dx * dx)
    return (1.0 / lam).astype(np.float32)


def spectral_dirichlet_solve_3d(b: jnp.ndarray,
                                dx: float = 1.0) -> jnp.ndarray:
    d, h, w = b.shape[-3], b.shape[-2], b.shape[-1]
    inv_lam = jnp.asarray(_inv_dirichlet_eigenvalues_3d(d, h, w, dx))
    return dst1_3d(dst1_3d(b) * inv_lam)
