"""Neural networks: CFE (control force estimator) and OP (observation
predictor) models — SURVEY.md §2a "Networks".
"""

from pde_control_tpu.models.nets import CFENet, UNet  # noqa: F401
