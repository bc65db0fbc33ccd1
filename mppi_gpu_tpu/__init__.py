"""mppi_gpu_tpu — a TPU-native MPPI (Model Predictive Path Integral) control framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference CUDA
implementation (NicolayP/mppi_gpu): K-sample stochastic rollouts of a dynamics
model over horizon T, softmin-weighted action updates, and a receding-horizon
closed loop against a ground-truth world simulator.

Architecture (TPU-first, not a port):
  * the reference's one-CUDA-thread-per-rollout kernel (reference
    src/point_mass.cu:493-508) becomes a single jitted XLA program /
    fused Pallas kernel batched over K;
  * the reference's multi-launch min/sum reduction ladders
    (src/point_mass.cu:533-575, 628-666) become on-chip reductions plus
    `pmin`/`psum` collectives over a `jax.sharding.Mesh`;
  * the reference's per-timestep `update_act` host loop — its acknowledged
    bottleneck (src/point_mass.cu:187) — becomes one K×(T·A) contraction
    that maps onto the MXU;
  * cuRAND per-thread state becomes counter-based `jax.random` keys (or the
    on-chip Pallas PRNG inside the fused kernel) — deterministic and
    replay-friendly.
"""

from mppi_gpu_tpu.config import MPPIConfig, load_config
from mppi_gpu_tpu.controller import (
    MPPIController,
    SolveInfo,
    SolveResult,
    mppi_solve,
    mppi_solve_deterministic,
)
from mppi_gpu_tpu.ops.cost import register_cost
from mppi_gpu_tpu.ops.pallas_rollout import register_family

__version__ = "0.1.0"

__all__ = [
    "MPPIConfig",
    "load_config",
    "MPPIController",
    "SolveInfo",
    "SolveResult",
    "mppi_solve",
    "mppi_solve_deterministic",
    "register_cost",
    "register_family",
]
