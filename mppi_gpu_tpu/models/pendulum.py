"""Pendulum (torque-limited swing-up) dynamics — a nonlinear second model
family. No reference analog (the reference is point-mass only, but its
roadmap is pluggable models; reference README TODO + src/controller_base.cpp):
this is the first dynamics where the MPPI machinery has to handle
trigonometric nonlinearity and an underactuated task.

State ``x = [θ, θ̇]`` with θ measured from UPRIGHT (θ=0 balanced, θ=π
hanging down), action ``u`` = motor torque (N·m):

    θ̈ = (g / l) · sin θ  +  u / (m l²)  −  b · θ̇

integrated with one RK2 (midpoint) step of ``dt`` per horizon step — cheap
enough for K×T rollouts, accurate enough at dt≈0.05; the ground-truth world
(envs/pendulum_world.py) integrates the same ODE with RK4 at a 10× finer
timestep, giving the same deliberate model-plant gap the point-mass family
has."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass


@register_dataclass
@dataclass(frozen=True)
class PendulumDynamics:
    dt: jax.Array        # integration step per horizon step
    mass: jax.Array      # m (kg)
    length: jax.Array    # l (m)
    gravity: jax.Array   # g (m/s²)
    damping: jax.Array   # b (1/s)
    state_dim: int = field(metadata=dict(static=True), default=2)
    action_dim: int = field(metadata=dict(static=True), default=1)

    @staticmethod
    def create(
        dt: float,
        mass: float = 1.0,
        length: float = 1.0,
        gravity: float = 9.81,
        damping: float = 0.1,
    ) -> "PendulumDynamics":
        return PendulumDynamics(
            dt=jnp.float32(dt), mass=jnp.float32(mass), length=jnp.float32(length),
            gravity=jnp.float32(gravity), damping=jnp.float32(damping),
        )

    def accel(self, th: jax.Array, thd: jax.Array, u: jax.Array) -> jax.Array:
        return (
            (self.gravity / self.length) * jnp.sin(th)
            + u / (self.mass * self.length**2)
            - self.damping * thd
        )

    def step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        th, thd = x[..., 0], x[..., 1]
        u0 = u[..., 0]
        h = self.dt
        # RK2 midpoint
        k1_th, k1_thd = thd, self.accel(th, thd, u0)
        th_m = th + 0.5 * h * k1_th
        thd_m = thd + 0.5 * h * k1_thd
        k2_th, k2_thd = thd_m, self.accel(th_m, thd_m, u0)
        return jnp.stack([th + h * k2_th, thd + h * k2_thd], axis=-1)
