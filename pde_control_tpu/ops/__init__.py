"""Spatial operators: stencils (gradient/laplace/divergence) and interpolation.

TPU-native replacement for the reference's `phi/math/nd.py` [R] spatial ops
(SURVEY.md L0) — pure shifted-slice arithmetic that XLA fuses into elementwise
kernels; no dynamic gathers except in the semi-Lagrangian sampler (see interp).
"""

from pde_control_tpu.ops.stencils import laplace, pad_edge  # noqa: F401
from pde_control_tpu.ops.interp import (  # noqa: F401
    linear_sample_1d,
    bilinear_sample_2d,
    shift_bilinear_sample_2d,
)
from pde_control_tpu.ops.spectral import (  # noqa: F401
    spectral_dirichlet_solve,
    spectral_neumann_solve,
)
