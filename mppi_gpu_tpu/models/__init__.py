"""Dynamics models usable inside the MPPI rollout.

Models are pytree dataclasses exposing ``step(x, u_eff) -> x_next`` where both
``x`` and ``u_eff`` carry arbitrary leading batch dims — rollouts batch over K
with plain broadcasting, no vmap needed for the analytic models.
"""

from mppi_gpu_tpu.models.base import Dynamics
from mppi_gpu_tpu.models.point_mass import PointMassLTI
from mppi_gpu_tpu.models.neural import MLPDynamics, init_mlp_dynamics

__all__ = ["Dynamics", "PointMassLTI", "MLPDynamics", "init_mlp_dynamics"]
