"""Ground-truth pendulum world: same ODE as the controller's model
(models/pendulum.py) but integrated with RK4 at a 10× finer timestep — the
same deliberate integration-level model-plant gap the point-mass family has
(there: LTI at dt=0.1 vs RK4 damped world at 0.01)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class PendulumParams:
    mass: float = 1.0
    length: float = 1.0
    gravity: float = 9.81
    damping: float = 0.1
    max_torque: float = 2.0        # actuator clamp (underactuated: < m·g·l)
    timestep: float = 0.005        # physics dt (RK4)
    control_period: float = 1.0 / 60.0
    sim_end: float = 10.0001
    init_theta: float = 3.14159265  # hanging down

    @property
    def n_axes(self) -> int:  # world-adapter API parity with WorldParams
        return 1

    @property
    def state_dim(self) -> int:
        return 2

    @property
    def steps_per_control(self) -> int:
        import math

        return math.ceil(self.control_period / self.timestep - 1e-9)

    def num_control_steps(self) -> int:
        import math

        per_cycle = self.steps_per_control * self.timestep
        return math.ceil((self.sim_end - self.timestep) / per_cycle)


class PendulumState(NamedTuple):
    th: jax.Array
    thd: jax.Array
    time: jax.Array

    @property
    def x(self) -> jax.Array:
        return jnp.stack([self.th, self.thd])


@dataclass(frozen=True)
class PendulumWorld:
    params: PendulumParams

    def _accel(self, th, thd, u):
        p = self.params
        return (
            (p.gravity / p.length) * jnp.sin(th)
            + u / (p.mass * p.length**2)
            - p.damping * thd
        )

    def physics_step(self, s: PendulumState, u: jax.Array) -> PendulumState:
        p = self.params
        h = p.timestep
        u0 = jnp.clip(u[..., 0], -p.max_torque, p.max_torque)
        th, thd = s.th, s.thd
        k1t, k1v = thd, self._accel(th, thd, u0)
        k2t, k2v = thd + 0.5 * h * k1v, self._accel(th + 0.5 * h * k1t, thd + 0.5 * h * k1v, u0)
        k3t, k3v = thd + 0.5 * h * k2v, self._accel(th + 0.5 * h * k2t, thd + 0.5 * h * k2v, u0)
        k4t, k4v = thd + h * k3v, self._accel(th + h * k3t, thd + h * k3v, u0)
        return PendulumState(
            th=th + (h / 6.0) * (k1t + 2 * k2t + 2 * k3t + k4t),
            thd=thd + (h / 6.0) * (k1v + 2 * k2v + 2 * k3v + k4v),
            time=s.time + h,
        )

    def reset(self) -> PendulumState:
        p = self.params
        return PendulumState(
            th=jnp.float32(p.init_theta), thd=jnp.float32(0.0),
            time=jnp.float32(p.timestep),
        )

    def simulate(self, s: PendulumState, u: jax.Array) -> tuple[PendulumState, jax.Array]:
        done = s.time >= self.params.sim_end
        new = s
        for _ in range(self.params.steps_per_control):
            new = self.physics_step(new, u)
        new = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), s, new)
        return new, done

    def step(self, s: PendulumState, u: jax.Array) -> PendulumState:
        return self.physics_step(s, u)

    def get_x(self, s: PendulumState) -> jax.Array:
        return s.x

    def from_x(self, x: jax.Array, time: float) -> PendulumState:
        """Inverse of get_x (checkpoint restore): x = [θ, θ̇]."""
        return PendulumState(th=x[0], thd=x[1], time=jnp.float32(time))
