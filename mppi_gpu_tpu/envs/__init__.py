"""Ground-truth world simulators (the analog of the reference's MuJoCo env).

Three interchangeable backends with identical physics:
  * `PointMassWorld` — pure JAX; jittable, so a whole closed-loop episode can
    run as one XLA program.
  * `NativePointMassWorld` — C++ (csrc/world.cpp via ctypes); host-side like
    the reference's MuJoCo env, used for the interactive loop and as an
    independent implementation to test the JAX env against.
  * `MujocoPointMassWorld` (envs/mujoco_world.py) — the reference's ACTUAL
    plant: real `mujoco.mj_step` (optional dependency). The analytic worlds
    track it to ~2e-7 in the interior (tests/test_mujoco_xval.py).
"""

from mppi_gpu_tpu.envs.params import WorldParams, world_params_for_config
from mppi_gpu_tpu.envs.point_mass_world import PointMassWorld
from mppi_gpu_tpu.envs.cartpole_world import CartPoleParams, CartPoleWorld
from mppi_gpu_tpu.envs.pendulum_world import PendulumParams, PendulumWorld
from mppi_gpu_tpu.envs.quadrotor_world import QuadrotorParams, QuadrotorWorld
from mppi_gpu_tpu.envs.quadrotor3d_world import Quadrotor3DParams, Quadrotor3DWorld
from mppi_gpu_tpu.envs.unicycle_world import UnicycleParams, UnicycleWorld
from mppi_gpu_tpu.envs.arm_world import ArmParams, ArmWorld
from mppi_gpu_tpu.envs.native import NativePointMassWorld, native_available


def is_pendulum_env(env: str) -> bool:
    return "pendulum" in str(env)


def is_unicycle_env(env: str) -> bool:
    return "unicycle" in str(env)


def is_arm_env(env: str) -> bool:
    return "arm" in str(env)


def is_cartpole_env(env: str) -> bool:
    return "cartpole" in str(env)


def is_quadrotor3d_env(env: str) -> bool:
    return "quadrotor3d" in str(env)


def is_quadrotor_env(env: str) -> bool:
    # the PLANAR family; "quadrotor3d" is its own family (checked first
    # everywhere, and excluded here so dispatch order can never matter)
    return "quadrotor" in str(env) and not is_quadrotor3d_env(env)


def params_for_config(cfg):
    """Env-family dispatch: the config's `env` name (or XML path) selects the
    world family and its physical parameters."""
    if is_arm_env(cfg.env):
        return ArmParams(max_t1=cfg.max_a[0], max_t2=cfg.max_a[1])
    if is_unicycle_env(cfg.env):
        return UnicycleParams(max_v=cfg.max_a[0], max_w=cfg.max_a[1])
    if is_cartpole_env(cfg.env):
        return CartPoleParams(max_force=max(cfg.max_a))
    if is_pendulum_env(cfg.env):
        return PendulumParams(max_torque=max(cfg.max_a))
    if is_quadrotor3d_env(cfg.env):
        # max-a[0] bounds the collective F = Σ f_i over 4 rotors, so the
        # per-rotor envelope is a quarter of it (envs/quadrotor3d_world.py)
        return Quadrotor3DParams(max_thrust=cfg.max_a[0] / 4.0)
    if is_quadrotor_env(cfg.env):
        # max-a[0] bounds the collective F = f_l + f_r, so the per-rotor
        # envelope is half of it (mixer semantics, models/quadrotor.py)
        return QuadrotorParams(max_thrust=cfg.max_a[0] / 2.0)
    return world_params_for_config(cfg)


def make_jax_world(cfg, params=None):
    params = params if params is not None else params_for_config(cfg)
    if isinstance(params, ArmParams):
        return ArmWorld(params)
    if isinstance(params, UnicycleParams):
        return UnicycleWorld(params)
    if isinstance(params, CartPoleParams):
        return CartPoleWorld(params)
    if isinstance(params, PendulumParams):
        return PendulumWorld(params)
    if isinstance(params, Quadrotor3DParams):
        return Quadrotor3DWorld(params)
    if isinstance(params, QuadrotorParams):
        return QuadrotorWorld(params)
    return PointMassWorld(params)


__all__ = [
    "WorldParams",
    "world_params_for_config",
    "params_for_config",
    "make_jax_world",
    "is_pendulum_env",
    "is_unicycle_env",
    "is_arm_env",
    "ArmParams",
    "ArmWorld",
    "is_cartpole_env",
    "is_quadrotor_env",
    "is_quadrotor3d_env",
    "PointMassWorld",
    "QuadrotorWorld",
    "QuadrotorParams",
    "Quadrotor3DWorld",
    "Quadrotor3DParams",
    "PendulumWorld",
    "PendulumParams",
    "CartPoleWorld",
    "UnicycleWorld",
    "UnicycleParams",
    "CartPoleParams",
    "NativePointMassWorld",
    "native_available",
]
