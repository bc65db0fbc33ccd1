"""Dynamics models usable inside the MPPI rollout.

Models are pytree dataclasses exposing ``step(x, u_eff) -> x_next`` where both
``x`` and ``u_eff`` carry arbitrary leading batch dims — rollouts batch over K
with plain broadcasting, no vmap needed for the analytic models.
"""

from mppi_gpu_tpu.models.base import Dynamics
from mppi_gpu_tpu.models.point_mass import PointMassLTI
from mppi_gpu_tpu.models.cartpole import CartPoleDynamics
from mppi_gpu_tpu.models.pendulum import PendulumDynamics
from mppi_gpu_tpu.models.quadrotor import QuadrotorDynamics
from mppi_gpu_tpu.models.quadrotor3d import Quadrotor3DDynamics
from mppi_gpu_tpu.models.unicycle import UnicycleDynamics
from mppi_gpu_tpu.models.arm import TwoLinkArmDynamics
from mppi_gpu_tpu.models.neural import (
    HybridResidualDynamics,
    MLPDynamics,
    init_mlp_dynamics,
)


def dynamics_for_config(cfg) -> Dynamics:
    """Default rollout model for a config's env family (override by passing
    `dynamics=` to the controller)."""
    if "arm" in str(cfg.env):
        return TwoLinkArmDynamics.create(cfg.dt)
    if "unicycle" in str(cfg.env):
        return UnicycleDynamics.create(cfg.dt)
    if "cartpole" in str(cfg.env):
        return CartPoleDynamics.create(cfg.dt)
    if "pendulum" in str(cfg.env):
        return PendulumDynamics.create(cfg.dt)
    if "quadrotor3d" in str(cfg.env):
        return Quadrotor3DDynamics.create(cfg.dt)
    if "quadrotor" in str(cfg.env):
        return QuadrotorDynamics.create(cfg.dt)
    return PointMassLTI.create(cfg.dt, cfg.action_dim)


__all__ = [
    "Dynamics", "PointMassLTI", "PendulumDynamics", "CartPoleDynamics",
    "QuadrotorDynamics", "Quadrotor3DDynamics", "UnicycleDynamics",
    "TwoLinkArmDynamics", "MLPDynamics",
    "HybridResidualDynamics",
    "init_mlp_dynamics", "dynamics_for_config",
]
