"""Ground-truth unicycle world: the same differential-drive kinematics as
the controller's model (models/unicycle.py) integrated with RK4 at a 10×
finer timestep, with the actuator clamp applied to the commanded [v, ω] —
the same deliberate integration-level model-plant gap every family has.
(No real-MuJoCo twin: the model is kinematic — there is no contact or
inertia physics for MuJoCo to adjudicate, so the fine-RK4 world IS the
plant; `--world mujoco` reports this cleanly.)"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class UnicycleParams:
    max_v: float = 1.5            # forward-speed clamp (m/s)
    max_w: float = 2.5            # turn-rate clamp (rad/s)
    timestep: float = 0.005       # physics dt (RK4)
    control_period: float = 1.0 / 60.0
    sim_end: float = 10.0001
    init_pose: tuple = (0.0, 0.0, 0.0)

    @property
    def n_axes(self) -> int:  # world-adapter API parity with WorldParams
        return 2

    @property
    def state_dim(self) -> int:
        return 3

    @property
    def steps_per_control(self) -> int:
        import math

        return math.ceil(self.control_period / self.timestep - 1e-9)

    def num_control_steps(self) -> int:
        import math

        per_cycle = self.steps_per_control * self.timestep
        return math.ceil((self.sim_end - self.timestep) / per_cycle)


class UnicycleState(NamedTuple):
    pose: jax.Array  # (3,) = [px, py, θ]
    time: jax.Array

    @property
    def x(self) -> jax.Array:
        return self.pose


@dataclass(frozen=True)
class UnicycleWorld:
    params: UnicycleParams

    @staticmethod
    def _deriv(pose: jax.Array, v: jax.Array, w: jax.Array) -> jax.Array:
        th = pose[..., 2]
        return jnp.stack(
            [v * jnp.cos(th), v * jnp.sin(th), jnp.broadcast_to(w, th.shape)],
            axis=-1,
        )

    def physics_step(self, s: UnicycleState, u: jax.Array) -> UnicycleState:
        p = self.params
        h = p.timestep
        v = jnp.clip(u[..., 0], -p.max_v, p.max_v)
        w = jnp.clip(u[..., 1], -p.max_w, p.max_w)
        y = s.pose
        k1 = self._deriv(y, v, w)
        k2 = self._deriv(y + 0.5 * h * k1, v, w)
        k3 = self._deriv(y + 0.5 * h * k2, v, w)
        k4 = self._deriv(y + h * k3, v, w)
        return UnicycleState(
            pose=y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4),
            time=s.time + h,
        )

    def reset(self) -> UnicycleState:
        return UnicycleState(
            pose=jnp.asarray(self.params.init_pose, jnp.float32),
            time=jnp.float32(self.params.timestep),
        )

    def simulate(self, s: UnicycleState, u: jax.Array) -> tuple[UnicycleState, jax.Array]:
        done = s.time >= self.params.sim_end
        new = s
        for _ in range(self.params.steps_per_control):
            new = self.physics_step(new, u)
        new = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), s, new)
        return new, done

    def step(self, s: UnicycleState, u: jax.Array) -> UnicycleState:
        return self.physics_step(s, u)

    def get_x(self, s: UnicycleState) -> jax.Array:
        return s.x

    def from_x(self, x: jax.Array, time: float) -> UnicycleState:
        """Inverse of get_x (checkpoint restore): x = [px, py, θ]."""
        return UnicycleState(pose=x, time=jnp.float32(time))
