"""Experiment drivers — rebuild of the reference notebooks [R] (SURVEY.md L7)
as plain CLIs: `python -m pde_control_tpu.experiments.run <name> [options]`.

One module per BASELINE.json config:
  * burgers    — configs 1-2 (CFE chain; hierarchical OP + e2e finetune)
  * shape2d    — config 3 (64² shape transition, direct forcing)
  * smoke      — config 4 (indirect buoyancy-only control, obstacles)
  * natural128 — config 5 (128-step reconstruction, DP over mesh)
"""
