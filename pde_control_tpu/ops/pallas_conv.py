"""Pallas TPU kernel: 3×3 SAME conv as one VMEM-resident im2col matmul.

Why this exists (round-3 profiling, v5e): the judged training iteration is
dominated by the CFE/OP conv stacks, and XLA's conv lowering at our shapes —
(8, 64, 64, 32..64ch) bf16 — sustains only ~13 TFLOP/s against a measured
157 TFLOP/s chip ceiling (carry-chained matmul calibration; see RESULTS.md
round-3 "where the iteration actually goes"). The main losses are HBM
streaming between layers and quarter-filled MXU passes (K = C = 64). This
kernel removes both for a single conv: the input tile lives in VMEM, the
nine taps are concatenated into one (H·W, 9C) im2col operand, and the conv
becomes ONE matmul with K = 9C (≥ 288 — full-K MXU occupancy).

Analog of the reference's stance that hot ops get native kernels
(`phi/tf/cuda/src/*` [R], SURVEY §2c); the op itself replaces XLA's
`conv_general_dilated` on the hot path, not any reference code.

Scope (falls back to XLA outside it — models/nets.py :: Conv):
  * 2D, 3×3 window, stride 1, SAME zero padding, no dilation/groups;
  * per-sample im2col buffer must fit VMEM (`conv3x3_fits`);
  * forward + custom VJP (dX via the rotated/transposed-weight conv — the
    SAME kernel — and dW via a pixel-contracting dot accumulated across the
    batch grid).

Numerics: operands cast to the requested compute dtype (bf16 on the 2D
fluid path), accumulation in fp32 (`preferred_element_type`), outputs cast
back — matching flax.linen.Conv(dtype=...) to within reassociation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def conv3x3_fits(h: int, w: int, cin: int, cout: int,
                 itemsize: int = 2) -> bool:
    """Conservative per-sample VMEM gate: input + padded input + im2col
    (the dominant term) + output, with lane padding to 128."""
    lane = lambda c: max(c, 128)
    x = h * w * lane(cin)
    xp = (h + 2) * (w + 2) * lane(cin)
    im2col = h * w * max(9 * cin, 128)
    y = h * w * lane(cout)
    return (x + xp + im2col + y) * itemsize + 4 * y < _VMEM_BUDGET_BYTES


def _pad_hw(x):
    """Zero-pad (H, W, C) by 1 on both spatial sides."""
    h, w, c = x.shape
    zr = jnp.zeros((1, w, c), x.dtype)
    x = jnp.concatenate([zr, x, zr], axis=0)
    zc = jnp.zeros((h + 2, 1, c), x.dtype)
    return jnp.concatenate([zc, x, zc], axis=1)


def _im2col(x):
    """(H, W, C) → (H·W, 9C): tap order (dy, dx) row-major, matching the
    (3, 3, C, Co) → (9C, Co) weight reshape."""
    h, w, c = x.shape
    xp = _pad_hw(x)
    cols = [xp[dy:dy + h, dx:dx + w, :].reshape(h * w, c)
            for dy in range(3) for dx in range(3)]
    return jnp.concatenate(cols, axis=1)


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, *, out_dtype):
    x = x_ref[0]
    h, w, _ = x.shape
    co = y_ref.shape[-1]
    acc = jax.lax.dot_general(
        _im2col(x), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + b_ref[...]
    y_ref[0] = acc.reshape(h, w, co).astype(out_dtype)


def _dw_kernel(x_ref, g_ref, dw_ref):
    """dW[9C, Co] += im2col(x)ᵀ @ dY, accumulated across the batch grid."""
    i = pl.program_id(0)
    x = x_ref[0]
    g = g_ref[0]
    h, w, co = g.shape
    part = jax.lax.dot_general(
        _im2col(x), g.reshape(h * w, co),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        dw_ref[...] = part

    @pl.when(i > 0)
    def _acc():
        dw_ref[...] += part


@functools.lru_cache(maxsize=None)
def _make_conv(h: int, w: int, cin: int, cout: int, dtype_name: str,
               interpret: bool):
    """Build the custom_vjp'd conv for one static (shape, dtype) config."""
    cdtype = jnp.dtype(dtype_name)

    def _run_fwd(x, wflat, b):
        bsz = x.shape[0]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, out_dtype=cdtype),
            grid=(bsz,),
            out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), cdtype),
            in_specs=[
                pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, wflat, b)

    @jax.custom_vjp
    def conv(x, wflat, wback, b):
        return _run_fwd(x, wflat, b)

    def fwd(x, wflat, wback, b):
        return _run_fwd(x, wflat, b), (x, wback)

    def bwd(res, g):
        x, wback = res
        bsz = x.shape[0]
        # dX: conv of the cotangent with the rotated, io-transposed weights
        # (same kernel, zero bias).
        zb = jnp.zeros((1, cin), jnp.float32)
        g_x = pl.pallas_call(
            functools.partial(_fwd_kernel, out_dtype=cdtype),
            grid=(bsz,),
            out_shape=jax.ShapeDtypeStruct((bsz, h, w, cin), cdtype),
            in_specs=[
                pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * cout, cin), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cin), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(g.astype(cdtype), wback, zb)
        # dW: pixel-contracting dot, accumulated across the batch grid into
        # one (9C, Co) fp32 block.
        g_w = pl.pallas_call(
            _dw_kernel,
            grid=(bsz,),
            out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
            in_specs=[
                pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, g.astype(cdtype))
        g_b = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))[None, :]
        # wback carries no independent information (it is a re-layout of
        # the same kernel); the weight cotangent flows through wflat only.
        g_wback = jnp.zeros((9 * cout, cin), cdtype)
        return g_x, g_w.astype(cdtype), g_wback, g_b.astype(cdtype)

    conv.defvjp(fwd, bwd)
    return conv


def conv3x3(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None,
            *, dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """3×3 SAME stride-1 conv, channels-last: (B, H, W, Cin) × (3, 3, Cin,
    Co) → (B, H, W, Co). Differentiable in x / kernel / bias; compute in
    `dtype` with fp32 accumulation (flax.linen.Conv(dtype=...) semantics)."""
    b_, h, w, cin = x.shape
    kh, kw, kc, cout = kernel.shape
    if (kh, kw) != (3, 3) or kc != cin:
        raise ValueError(f"conv3x3 needs a (3, 3, {cin}, Co) kernel, "
                         f"got {kernel.shape}")
    cdtype = jnp.dtype(dtype)
    wflat = kernel.astype(cdtype).reshape(9 * cin, cout)
    # dX weights: rotate the window 180° and swap in/out channels.
    wback = kernel[::-1, ::-1].transpose(0, 1, 3, 2).astype(
        cdtype).reshape(9 * cout, cin)
    bvec = (jnp.zeros((cout,), jnp.float32) if bias is None
            else bias.astype(jnp.float32))[None, :]
    conv = _make_conv(h, w, cin, cout, cdtype.name, bool(interpret))
    return conv(x.astype(cdtype), wflat, wback, bvec.astype(cdtype))
