"""Ground-truth world simulators (the analog of the reference's MuJoCo env).

Two interchangeable backends with identical physics:
  * `PointMassWorld` — pure JAX; jittable, so a whole closed-loop episode can
    run as one XLA program.
  * `NativePointMassWorld` — C++ (csrc/world.cpp via ctypes); host-side like
    the reference's MuJoCo env, used for the interactive loop and as an
    independent implementation to test the JAX env against.
"""

from mppi_gpu_tpu.envs.params import WorldParams, world_params_for_config
from mppi_gpu_tpu.envs.point_mass_world import PointMassWorld
from mppi_gpu_tpu.envs.native import NativePointMassWorld, native_available

__all__ = [
    "WorldParams",
    "world_params_for_config",
    "PointMassWorld",
    "NativePointMassWorld",
    "native_available",
]
