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
import jax
import jax.numpy as jnp


class Conv(nn.Conv):
    """nn.Conv with an optional Pallas fast path for the hot shape.

    2D 3×3 stride-1 SAME convs — the entire CFE stack and the full-res
    U-net layers — route to `ops/pallas_conv.py :: conv3x3` (one
    VMEM-resident im2col matmul; XLA's conv lowering sustains ~13 TFLOP/s
    at these shapes vs ~157 measured chip ceiling). Everything else
    (strided, CIRCULAR, 1×1, 1D/3D, too-big-for-VMEM) falls back to the
    stock nn.Conv. The subclass keeps the class name `Conv` so flax
    auto-naming — and therefore every existing checkpoint — is unchanged.

    conv_impl: 'xla' = stock nn.Conv; 'pallas' = Pallas im2col kernel when
    eligible (interpret mode off-TPU); 'patches' = XLA patches+matmul
    reformulation when eligible; 'shifted' = 9 statically-shifted views ×
    per-tap (Cin,Cout) dots, summed (no im2col materialization);
    'im2col' = the 9 views concatenated + ONE (…,9·Cin)×(9·Cin,Cout)
    matmul (patches semantics, but marshaled by plain slices/concat
    instead of the pathologically-lowered patches op); 'auto' = best
    measured TPU path — which IS 'xla' (see below).

    Round-3 conv campaign, all measured on v5e at the judged iteration
    (scripts/ab_conv.py, value-fetch-synced, interleaved arms; XLA arm
    26.5-26.6 ms/iter): XLA's conv lowering sustains only ~13 TFLOP/s at
    our shapes (vs 157 measured matmul ceiling — Cout ≤ 64 underfills
    the MXU lane dim), but every alternative formulation lost to it:
      * 'pallas' (one VMEM-resident im2col matmul per sample, K = 9·Cin,
        custom VJP): 42.2 ms/iter, 0.63× — the in-kernel im2col
        marshaling (9 shifted copies + concat per program) costs more
        than full-K MXU occupancy wins back.
      * 'patches' (conv_general_dilated_patches + one dot_general —
        XLA does the marshaling, contraction rides the matmul path):
        453 ms/iter, 0.06× — the patches op itself lowers ~17× worse
        than the fused conv it replaces.
    Both kept for the record and for other hardware/shape regimes;
    production and bench use the stock lowering.
    """

    conv_impl: str = "xla"

    def _conv_params(self, x):
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, x.shape[-1], self.features),
            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype)
                if self.use_bias else None)
        return kernel, bias

    def _shifted_call(self, x, single_dot: bool):
        """3×3 SAME stride-1 conv re-expressed WITHOUT the conv op:
        zero-pad once, take the 9 statically-shifted views, and contract
        against the per-tap (Cin, Cout) weights on the plain matmul path.

        single_dot=False ('shifted'): 9 independent dot_generals summed —
        no im2col materialization at all; XLA fuses each tap's slice into
        its dot's operand load.
        single_dot=True ('im2col'): concatenate the 9 views on the channel
        axis and run ONE (B·H·W, 9·Cin) × (9·Cin, Cout) matmul — the
        'patches' formulation but with the marshaling done by 9 static
        slices + concat (plain copies) instead of
        conv_general_dilated_patches, whose own lowering is the measured
        17× pathology."""
        kernel, bias = self._conv_params(x)
        dtype = self.dtype or x.dtype
        xc = x.astype(dtype)
        kc = kernel.astype(dtype)
        b, h, w, cin = x.shape
        xp = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [xp[:, dy:dy + h, dx:dx + w, :]
                for dy in range(3) for dx in range(3)]
        if single_dot:
            p = jnp.concatenate(taps, axis=-1)          # (B,H,W,9·Cin)
            wflat = kc.reshape(9 * cin, self.features)   # tap-major rows
            y = jax.lax.dot_general(
                p, wflat, dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            y = None
            for tap, (dy, dx) in zip(taps, [(i, j) for i in range(3)
                                            for j in range(3)]):
                t = jax.lax.dot_general(
                    tap, kc[dy, dx],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y = t if y is None else y + t
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(dtype)

    def _patches_call(self, x):
        """3×3 SAME stride-1 conv as patches + one dot_general."""
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, x.shape[-1], self.features),
            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype)
                if self.use_bias else None)
        dtype = self.dtype or x.dtype
        xc = x.astype(dtype)
        b, h, w, cin = x.shape
        p = jax.lax.conv_general_dilated_patches(
            xc, (3, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # patches feature dim is channel-major: (Cin, ky, kx)
        wflat = kernel.astype(dtype).transpose(2, 0, 1, 3).reshape(
            9 * cin, self.features)
        y = jax.lax.dot_general(
            p.reshape(b * h * w, 9 * cin), wflat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.reshape(b, h, w, self.features).astype(dtype)

    def _shape_eligible(self, x) -> bool:
        def _ones(v):
            if v is None or v == 1:
                return True
            return all(s == 1 for s in (
                (v,) if isinstance(v, int) else tuple(v)))

        return (
            x.ndim == 4
            and tuple(self.kernel_size) == (3, 3)
            and self.padding == "SAME"
            and _ones(self.strides)
            and _ones(self.input_dilation)
            and _ones(self.kernel_dilation)
            and self.feature_group_count == 1
        )

    def _pallas_eligible(self, x) -> bool:
        import jax.numpy as jnp

        from pde_control_tpu.ops.pallas_conv import conv3x3_fits

        itemsize = jnp.dtype(self.dtype or x.dtype).itemsize
        return self._shape_eligible(x) and conv3x3_fits(
            x.shape[1], x.shape[2], x.shape[3], self.features,
            itemsize=itemsize)

    @nn.compact
    def __call__(self, x):
        impl = self.conv_impl
        on_tpu = jax.default_backend() == "tpu"
        if impl == "patches" and self._shape_eligible(x):
            return self._patches_call(x)
        if impl in ("shifted", "im2col") and self._shape_eligible(x):
            return self._shifted_call(x, single_dot=impl == "im2col")
        # 'auto' routes to the stock lowering: both alternatives measured
        # slower on v5e (class docstring). Explicit 'pallas' still runs
        # (interpret mode off-TPU) so tests pin the kernel.
        use = impl == "pallas"
        if not (use and self._pallas_eligible(x)):
            return super().__call__(x)
        from pde_control_tpu.ops.pallas_conv import conv3x3

        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, x.shape[-1], self.features),
            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype)
                if self.use_bias else None)
        dtype = self.dtype or x.dtype
        y = conv3x3(x, kernel, bias, dtype=dtype, interpret=not on_tpu)
        return y.astype(dtype)


class ConvBlock(nn.Module):
    features: int
    dim: int
    padding: str = "SAME"
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        k = (3,) * self.dim
        x = Conv(self.features, k, padding=self.padding, dtype=self.dtype,
                 conv_impl=self.conv_impl)(x)
        x = nn.leaky_relu(x, 0.1)
        x = Conv(self.features, k, padding=self.padding, dtype=self.dtype,
                 conv_impl=self.conv_impl)(x)
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
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        k = (3,) * self.dim
        ci = self.conv_impl
        skips = []
        feats = self.base_features
        for _ in range(self.levels):
            x = ConvBlock(feats, self.dim, self.padding, self.dtype, ci)(x)
            skips.append(x)
            x = Conv(
                feats * 2, k, strides=(2,) * self.dim,
                padding=self.padding, dtype=self.dtype, conv_impl=ci,
            )(x)
            feats *= 2
        x = ConvBlock(feats, self.dim, self.padding, self.dtype, ci)(x)
        for skip in reversed(skips):
            feats //= 2
            x = _resize_up(x, self.dim)
            x = Conv(feats, k, padding=self.padding, dtype=self.dtype,
                     conv_impl=ci)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(feats, self.dim, self.padding, self.dtype, ci)(x)
        x = Conv(self.out_channels, (1,) * self.dim, dtype=self.dtype,
                 conv_impl=ci)(x)
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
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        k = (3,) * self.dim
        for f in self.features:
            x = Conv(f, k, padding=self.padding, dtype=self.dtype,
                     conv_impl=self.conv_impl)(x)
            x = nn.leaky_relu(x, 0.1)
        x = Conv(self.out_channels, k, padding=self.padding,
                 dtype=self.dtype, conv_impl=self.conv_impl,
                 kernel_init=nn.initializers.zeros)(x)
        return x.astype(in_dtype)
