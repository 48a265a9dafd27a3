"""Device-mesh helpers for data-parallel training.

Rebuild decision (SURVEY.md §2d): the reference is single-device; here DP is
first-class. A 1-axis `('data',)` mesh shards the batch dimension of every
grid/observation array; parameters are replicated. Gradients are averaged by
XLA-inserted all-reduce over ICI (`jit` with sharded inputs + replicated
params — no hand-written collectives needed; keep the axis name stable so a
('replica', 'data') DCN-ready mesh is a drop-in later).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, axis: str = "data",
    platform: str | None = None,
) -> Mesh:
    """A 1D mesh over the first `n_devices` devices (default: all).

    If the default platform has fewer than `n_devices` (e.g. 1 real TPU chip
    but an 8-device virtual CPU mesh was requested), falls back to
    `jax.devices('cpu')` — which honors xla_force_host_platform_device_count.
    """
    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None and len(devices) < n_devices and platform is None:
        import warnings

        devices = jax.devices("cpu")
        warnings.warn(
            f"make_mesh: default platform has {len(jax.devices())} device(s) "
            f"< {n_devices} requested — FALLING BACK TO CPU devices. Results "
            "validate sharding logic, not TPU execution; pass platform='cpu' "
            "to silence.", stacklevel=2)
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a batch pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_batch_multi(batches, mesh: Mesh, axis: str = "data"):
    """Place a stacked-batches pytree (leading (K, B, …) axes) with the
    SECOND axis (the per-step batch) sharded over the mesh — the layout
    progress_multi's scanned train steps expect."""
    sharding = NamedSharding(mesh, P(None, axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding),
                                  batches)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
