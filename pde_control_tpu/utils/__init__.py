"""Utilities: per-network checkpoints, metrics logging, profiling hooks."""

from pde_control_tpu.utils.checkpoint import (  # noqa: F401
    load_network,
    save_networks,
)
from pde_control_tpu.utils.logging import MetricsLogger  # noqa: F401
