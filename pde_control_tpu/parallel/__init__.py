"""Data-parallel mesh utilities (SURVEY.md §2d) — batch sharding over ICI."""

from pde_control_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
)
