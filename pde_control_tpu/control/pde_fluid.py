"""Incompressible-flow PDE plugin — rebuild of
`src/control/pde/incompressible_flow.py :: IncompressibleFluidPDE` [R]
(SURVEY.md §2a, BASELINE configs 3-5).

State = FluidState (MAC velocity + density). Observation = the density
(marker) field, one channel — the shape-transition and smoke tasks both
observe smoke density [R].

Two control modes (SURVEY.md §2a "two force modes"):
  * ``direct``   — CFE outputs a 2-channel centered force field, resampled
    to faces and applied as +dt·F (shape transition).
  * ``buoyancy`` — *indirect* control: CFE outputs a scalar field b(x); the
    force is an extra buoyancy term dt·b·ρ on y-faces only (upward forces
    proportional to local smoke density — the smoke-plume task [R?], the
    exact reference parameterization could not be read from the empty mount).

An optional static ``force_mask`` (H, W) restricts where forces may act.
"""

from __future__ import annotations

import jax.numpy as jnp

from pde_control_tpu.control.pde_base import PDE
from pde_control_tpu.grids import (
    Domain2D,
    Staggered2D,
    centered_to_x_faces,
    centered_to_y_faces,
)
from pde_control_tpu.models.nets import CFENet, UNet
from pde_control_tpu.physics.fluid import FluidConfig, FluidState, fluid_step


class IncompressibleFluidPDE(PDE):
    dim = 2
    obs_channels = 1

    def __init__(
        self,
        domain: Domain2D,
        cfg: FluidConfig = FluidConfig(),
        control: str = "direct",          # 'direct' | 'buoyancy'
        force_mask: jnp.ndarray | None = None,  # (H, W), 1 = forcing allowed
        unet_levels: int = 4,
        cfe_features: tuple | None = None,  # conv widths; None = CFENet
        # default. Wider CFEs cut per-step tracking drift on the indirect
        # smoke task (the binding error term — RESULTS.md config-4 note).
        op_base_features: int = 16,  # U-net stem width. Round-4 microbench
        # (scripts/ab_convwidth.py): conv wall-clock is ~flat in channel
        # width on this chip up to C≈256 (2.8 → 39.7 TFLOP/s at equal ms),
        # so doubling widths buys ~4x net FLOPs nearly free — the MXU-fill
        # operating-point lever (scripts/ab_width.py measures it end2end).
        with_inflow: bool = False,  # batches carry per-sample 'inflow' —
        # a continuous smoke source (reference Inflow FieldEffect [R]); the
        # CFE sees it as an extra input channel.
        dtype=jnp.bfloat16,  # net *compute* dtype (params stay fp32) — the
        # MXU-native choice; physics stays fp32 throughout.
        conv_impl: str = "xla",  # models/nets.py :: Conv — 'pallas' routes
        # eligible 3×3 convs to the im2col-matmul kernel (ops/pallas_conv).
    ):
        if control not in ("direct", "buoyancy"):
            raise ValueError(f"unknown control mode {control!r}")
        self.domain = domain
        self.cfg = cfg
        self.control = control
        self.force_mask = force_mask
        self.unet_levels = unet_levels
        self.cfe_features = cfe_features
        self.op_base_features = op_base_features
        self.with_inflow = with_inflow
        self.dtype = dtype
        self.conv_impl = conv_impl

    # solver ---------------------------------------------------------------
    def step(self, state: FluidState, force: Staggered2D | None) -> FluidState:
        return fluid_step(state, self.domain, self.cfg, force=force)

    def observe(self, state: FluidState) -> jnp.ndarray:
        return state.density[..., None]

    def zero_force(self, state: FluidState) -> Staggered2D:
        return Staggered2D(
            vy=jnp.zeros_like(state.velocity.vy),
            vx=jnp.zeros_like(state.velocity.vx),
        )

    def force_cost(self, force: Staggered2D) -> jnp.ndarray:
        dx2 = self.domain.dx * self.domain.dx
        return (
            jnp.sum(force.vy**2, axis=(1, 2)) + jnp.sum(force.vx**2, axis=(1, 2))
        ) * dx2

    # net glue ---------------------------------------------------------------
    def cfe_inputs(self, state: FluidState, target_obs: jnp.ndarray) -> jnp.ndarray:
        vy_c, vx_c = state.velocity.at_centers()
        mask = jnp.broadcast_to(
            self.domain.fluid_mask[None], state.density.shape
        )
        chans = [state.density, vy_c, vx_c, target_obs[..., 0], mask]
        if self.with_inflow:
            chans.append(state.inflow)
        return jnp.stack(chans, axis=-1)

    def force_from_net(self, net_out: jnp.ndarray, state: FluidState) -> Staggered2D:
        if self.force_mask is not None:
            net_out = net_out * self.force_mask[None, :, :, None]
        if self.control == "buoyancy":
            # Upward force ∝ smoke density, modulated by the net's scalar
            # field — forces exist only where smoke is (indirect control).
            b_at_y = centered_to_y_faces(net_out[..., 0] * state.density)
            return Staggered2D(vy=b_at_y, vx=jnp.zeros_like(state.velocity.vx))
        fy = centered_to_y_faces(net_out[..., 0])
        fx = centered_to_x_faces(net_out[..., 1])
        return Staggered2D(vy=fy, vx=fx)

    def build_cfe(self):
        out = 1 if self.control == "buoyancy" else 2
        kw = {"features": tuple(self.cfe_features)} if self.cfe_features \
            else {}
        return CFENet(out_channels=out, dim=2, dtype=self.dtype,
                      conv_impl=self.conv_impl, **kw)

    def build_op(self):
        return UNet(out_channels=1, levels=self.unet_levels,
                    base_features=self.op_base_features,
                    dim=2, dtype=self.dtype, conv_impl=self.conv_impl)

    def op_inputs(self, o_start, o_end):
        mask = jnp.broadcast_to(
            self.domain.fluid_mask[None, :, :, None], o_start.shape
        )
        return jnp.concatenate([o_start, o_end, mask], axis=-1)

    # data glue ---------------------------------------------------------------
    def initial_state(self, batch: dict) -> FluidState:
        h, w = self.domain.grid_shape
        b = batch["obs"].shape[0]
        if "vy0" in batch:
            vel = Staggered2D(vy=batch["vy0"], vx=batch["vx0"])
        else:
            vel = Staggered2D.zeros(b, h, w)
        inflow = None
        if self.with_inflow:
            if "inflow" not in batch:
                raise ValueError("with_inflow=True but batch has no 'inflow'")
            inflow = batch["inflow"]
        # Seeding a zero pressure makes every subsequent step warm-start its
        # projection from the previous step's solution (fluid.FluidState).
        pressure = (jnp.zeros((b, h, w), batch["obs"].dtype)
                    if self.cfg.warm_start_pressure else None)
        return FluidState(velocity=vel, density=batch["obs"][:, 0, :, :, 0],
                          inflow=inflow, pressure=pressure)

    def example_state(self, batch_size: int) -> FluidState:
        h, w = self.domain.grid_shape
        return FluidState.zeros(batch_size, h, w,
                                with_inflow=self.with_inflow)
