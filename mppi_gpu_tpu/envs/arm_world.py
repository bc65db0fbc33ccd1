"""Ground-truth two-link-arm world: the same manipulator equations as the
controller's model (models/arm.py — the world calls the model's `_deriv`,
so the physics constants can never drift apart) integrated with RK4 at a
~3.3× finer timestep (0.005 s vs the model's 1/60 s; 4 physics steps
advance the plant 0.02 s per control period — the same ceil-based slip
convention every family carries, matching the reference's MuJoCo loop,
/root/reference/src/PointMassEnv.cpp:136-139), with the torque clamp
applied to the commanded
[τ1, τ2] — the integration-level model-plant gap every family carries.
A real-MuJoCo twin exists too (envs/mujoco_world.MujocoArmWorld — a
generated uniform-rod MJCF whose CRB dynamics independently reproduce the
closed-form mass-matrix inverse to ~3e-6, tests/test_mujoco_xval.py); only
a native C++ twin is not wired (`--world native` reports this cleanly)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mppi_gpu_tpu.models.arm import TwoLinkArmDynamics


@dataclass(frozen=True)
class ArmParams:
    max_t1: float = 10.0          # shoulder torque clamp (N·m)
    max_t2: float = 5.0           # elbow torque clamp (N·m)
    timestep: float = 0.005       # physics dt (RK4)
    control_period: float = 1.0 / 60.0
    sim_end: float = 10.0001
    init_state: tuple = (-1.5707963, 0.0, 0.0, 0.0)  # hanging straight down
    # physical constants (same defaults as TwoLinkArmDynamics.create; the
    # analytic world AND the generated MuJoCo MJCF both read these, so the
    # three backends cannot drift apart)
    m1: float = 1.0
    m2: float = 1.0
    l1: float = 0.5
    l2: float = 0.5
    damping: float = 0.05
    gravity: float = 9.81
    max_rate: float = 12.0

    @property
    def n_axes(self) -> int:  # world-adapter API parity with WorldParams
        return 2

    @property
    def state_dim(self) -> int:
        return 4

    @property
    def steps_per_control(self) -> int:
        import math

        return math.ceil(self.control_period / self.timestep - 1e-9)

    def num_control_steps(self) -> int:
        import math

        per_cycle = self.steps_per_control * self.timestep
        return math.ceil((self.sim_end - self.timestep) / per_cycle)


class ArmState(NamedTuple):
    q: jax.Array  # (4,) = [q1, q2, qd1, qd2]
    time: jax.Array

    @property
    def x(self) -> jax.Array:
        return self.q


@dataclass(frozen=True)
class ArmWorld:
    params: ArmParams

    def __post_init__(self) -> None:
        # dt is irrelevant here (the world integrates with its own RK4);
        # what is borrowed is _deriv — the manipulator equations themselves
        p = self.params
        object.__setattr__(
            self, "_dyn",
            TwoLinkArmDynamics.create(
                p.timestep, m1=p.m1, m2=p.m2, l1=p.l1, l2=p.l2,
                damping=p.damping, gravity=p.gravity, max_rate=p.max_rate,
            ),
        )

    def physics_step(self, s: ArmState, u: jax.Array) -> ArmState:
        p = self.params
        h = p.timestep
        u = jnp.stack(
            [
                jnp.clip(u[..., 0], -p.max_t1, p.max_t1),
                jnp.clip(u[..., 1], -p.max_t2, p.max_t2),
            ],
            axis=-1,
        )
        y = s.q
        k1 = self._dyn._deriv(y, u)
        k2 = self._dyn._deriv(y + 0.5 * h * k1, u)
        k3 = self._dyn._deriv(y + 0.5 * h * k2, u)
        k4 = self._dyn._deriv(y + h * k3, u)
        return ArmState(
            # same physical joint-rate saturation the model applies
            q=self._dyn._sat(y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)),
            time=s.time + h,
        )

    def reset(self) -> ArmState:
        return ArmState(
            q=jnp.asarray(self.params.init_state, jnp.float32),
            time=jnp.float32(self.params.timestep),
        )

    def simulate(self, s: ArmState, u: jax.Array) -> tuple[ArmState, jax.Array]:
        done = s.time >= self.params.sim_end
        new = s
        for _ in range(self.params.steps_per_control):
            new = self.physics_step(new, u)
        new = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), s, new)
        return new, done

    def step(self, s: ArmState, u: jax.Array) -> ArmState:
        return self.physics_step(s, u)

    def get_x(self, s: ArmState) -> jax.Array:
        return s.x

    def from_x(self, x: jax.Array, time: float) -> ArmState:
        """Inverse of get_x (checkpoint restore): x = [q1, q2, qd1, qd2]."""
        return ArmState(q=x, time=jnp.float32(time))
