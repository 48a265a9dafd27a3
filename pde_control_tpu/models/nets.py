"""Flax networks for PDE control — dimension-parametric (1D Burgers / 2D NS).

Replaces the reference's TF1 net definitions [R] (SURVEY.md §2a "Networks"):
  * CFE: a plain conv net mapping (current state fields ⊕ next-frame target
    observation ⊕ constants) → force field.
  * OP: a "modified U-net" (paper wording) mapping obs(t_s) ⊕ obs(t_e) →
    obs(midpoint); one independent OP per hierarchy level.

TPU notes: channels-last layout, `dtype` attribute for bfloat16 compute with
fp32 params (MXU-friendly), strided-conv downsampling and resize-conv
upsampling (avoids ConvTranspose checkerboarding and keeps shapes static).
Padding is 'CIRCULAR' for periodic Burgers, 'SAME' otherwise.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int
    dim: int
    padding: str = "SAME"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (3,) * self.dim
        x = nn.Conv(self.features, k, padding=self.padding, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(self.features, k, padding=self.padding, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.1)
        return x


def _resize_up(x, dim: int):
    """Nearest-neighbor 2× upsample over the spatial axes (static shapes)."""
    for ax in range(1, 1 + dim):
        x = jnp.repeat(x, 2, axis=ax)
    return x


class UNet(nn.Module):
    """Multi-scale encoder-decoder with skip connections (the OP net).

    `levels` downsampling stages; spatial dims must be divisible by
    2**levels. Input/output are channels-last: (B, *spatial, C).
    """

    out_channels: int
    levels: int = 3
    base_features: int = 16
    dim: int = 2
    padding: str = "SAME"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        k = (3,) * self.dim
        skips = []
        feats = self.base_features
        for _ in range(self.levels):
            x = ConvBlock(feats, self.dim, self.padding, self.dtype)(x)
            skips.append(x)
            x = nn.Conv(
                feats * 2, k, strides=(2,) * self.dim,
                padding=self.padding, dtype=self.dtype,
            )(x)
            feats *= 2
        x = ConvBlock(feats, self.dim, self.padding, self.dtype)(x)
        for skip in reversed(skips):
            feats //= 2
            x = _resize_up(x, self.dim)
            x = nn.Conv(feats, k, padding=self.padding, dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(feats, self.dim, self.padding, self.dtype)(x)
        x = nn.Conv(self.out_channels, (1,) * self.dim, dtype=self.dtype)(x)
        return x.astype(in_dtype)


class CFENet(nn.Module):
    """Control-force estimator: a small conv net (the reference's CFE [R]).

    The output layer is ZERO-initialized: an untrained CFE exerts no force,
    so rollouts start at the natural (uncontrolled) trajectory and training
    refines from there. Without this, random initial forces destabilize
    long (e.g. 128-step) rollouts — advection clipping then flattens the
    gradients and the force regularizer dominates a stuck loss (observed on
    BASELINE config 5).
    """

    out_channels: int
    features: Sequence[int] = (32, 64, 64, 32)
    dim: int = 2
    padding: str = "SAME"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        k = (3,) * self.dim
        for f in self.features:
            x = nn.Conv(f, k, padding=self.padding, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(self.out_channels, k, padding=self.padding,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.zeros)(x)
        return x.astype(in_dtype)
