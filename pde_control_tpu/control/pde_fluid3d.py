"""3D incompressible-flow PDE plugin: the full CFE/OP control stack on
volumes.

Beyond-reference capability: the reference's control experiments are 1D/2D
(`src/control/pde/incompressible_flow.py` [R] is 2D), but its PhiFlow
dependency is dimension-general — this plugin closes the same gap here.
Identical contract to the 2D IncompressibleFluidPDE (control/pde_fluid.py):
observation = density, `direct` (3-channel centered force → faces) or
`buoyancy` (scalar field × density on z-faces) control, optional inflow
carried in the state. The dimension-parametric CFE/OP nets (models/nets.py)
are instantiated with dim=3 — no new network code.
"""

from __future__ import annotations

import jax.numpy as jnp

from pde_control_tpu.control.pde_base import PDE
from pde_control_tpu.grids3d import (
    Domain3D,
    Staggered3D,
    centered_to_x_faces_3d,
    centered_to_y_faces_3d,
    centered_to_z_faces,
)
from pde_control_tpu.models.nets import CFENet, UNet
from pde_control_tpu.physics.fluid3d import (
    Fluid3DConfig,
    FluidState3D,
    fluid3d_step,
)


class IncompressibleFluid3DPDE(PDE):
    dim = 3
    obs_channels = 1

    def __init__(
        self,
        domain: Domain3D,
        cfg: Fluid3DConfig = Fluid3DConfig(),
        control: str = "direct",          # 'direct' | 'buoyancy'
        force_mask: jnp.ndarray | None = None,  # (D, H, W), 1 = allowed
        unet_levels: int = 2,
        with_inflow: bool = False,
        dtype=jnp.bfloat16,  # net compute dtype; physics stays fp32
    ):
        if control not in ("direct", "buoyancy"):
            raise ValueError(f"unknown control mode {control!r}")
        self.domain = domain
        self.cfg = cfg
        self.control = control
        self.force_mask = force_mask
        self.unet_levels = unet_levels
        self.with_inflow = with_inflow
        self.dtype = dtype

    # physics glue -----------------------------------------------------------
    def step(self, state: FluidState3D, force: Staggered3D | None
             ) -> FluidState3D:
        return fluid3d_step(state, self.domain, self.cfg, force=force)

    def observe(self, state: FluidState3D) -> jnp.ndarray:
        return state.density[..., None]

    def zero_force(self, state: FluidState3D) -> Staggered3D:
        v = state.velocity
        return Staggered3D(vz=jnp.zeros_like(v.vz),
                           vy=jnp.zeros_like(v.vy),
                           vx=jnp.zeros_like(v.vx))

    def force_cost(self, force: Staggered3D) -> jnp.ndarray:
        dx3 = self.domain.dx ** 3
        return (
            jnp.sum(force.vz ** 2, axis=(1, 2, 3))
            + jnp.sum(force.vy ** 2, axis=(1, 2, 3))
            + jnp.sum(force.vx ** 2, axis=(1, 2, 3))
        ) * dx3

    # net glue ---------------------------------------------------------------
    def cfe_inputs(self, state: FluidState3D,
                   target_obs: jnp.ndarray) -> jnp.ndarray:
        vz_c, vy_c, vx_c = state.velocity.at_centers()
        mask = jnp.broadcast_to(
            self.domain.fluid_mask[None], state.density.shape)
        chans = [state.density, vz_c, vy_c, vx_c, target_obs[..., 0], mask]
        if self.with_inflow:
            chans.append(state.inflow)
        return jnp.stack(chans, axis=-1)

    def force_from_net(self, net_out: jnp.ndarray,
                       state: FluidState3D) -> Staggered3D:
        if self.force_mask is not None:
            net_out = net_out * self.force_mask[None, :, :, :, None]
        if self.control == "buoyancy":
            # Upward force ∝ smoke density, modulated by the net's scalar
            # field (indirect control; z+ is up).
            b_at_z = centered_to_z_faces(net_out[..., 0] * state.density)
            v = state.velocity
            return Staggered3D(vz=b_at_z, vy=jnp.zeros_like(v.vy),
                               vx=jnp.zeros_like(v.vx))
        fz = centered_to_z_faces(net_out[..., 0])
        fy = centered_to_y_faces_3d(net_out[..., 1])
        fx = centered_to_x_faces_3d(net_out[..., 2])
        return Staggered3D(vz=fz, vy=fy, vx=fx)

    def build_cfe(self):
        out = 1 if self.control == "buoyancy" else 3
        return CFENet(out_channels=out, dim=3, dtype=self.dtype)

    def build_op(self):
        return UNet(out_channels=1, levels=self.unet_levels,
                    base_features=16, dim=3, dtype=self.dtype)

    def op_inputs(self, o_start, o_end):
        mask = jnp.broadcast_to(
            self.domain.fluid_mask[None, :, :, :, None], o_start.shape)
        return jnp.concatenate([o_start, o_end, mask], axis=-1)

    # data glue ---------------------------------------------------------------
    def initial_state(self, batch: dict) -> FluidState3D:
        d, h, w = self.domain.grid_shape
        b = batch["obs"].shape[0]
        if "vz0" in batch:
            vel = Staggered3D(vz=batch["vz0"], vy=batch["vy0"],
                              vx=batch["vx0"])
        else:
            vel = Staggered3D.zeros(b, d, h, w)
        inflow = None
        if self.with_inflow:
            if "inflow" not in batch:
                raise ValueError("with_inflow=True but batch has no 'inflow'")
            inflow = batch["inflow"]
        pressure = (jnp.zeros((b, d, h, w), batch["obs"].dtype)
                    if self.cfg.warm_start_pressure else None)
        return FluidState3D(velocity=vel,
                            density=batch["obs"][:, 0, :, :, :, 0],
                            inflow=inflow, pressure=pressure)

    def example_state(self, batch_size: int) -> FluidState3D:
        d, h, w = self.domain.grid_shape
        return FluidState3D.zeros(batch_size, d, h, w,
                                  with_inflow=self.with_inflow)
