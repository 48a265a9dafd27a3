"""Data layer (SURVEY.md L5): scene directories, batch readers, generation."""

from pde_control_tpu.data.scene import Scene, SceneDataset, TrajectoryDataset  # noqa: F401
from pde_control_tpu.data.generate import (  # noqa: F401
    generate_burgers_dataset,
    generate_forced_smoke_dataset,
    generate_inflow_smoke_dataset,
    generate_smoke_dataset,
    random_burgers_states,
    random_inflow,
    random_shape_densities,
)
