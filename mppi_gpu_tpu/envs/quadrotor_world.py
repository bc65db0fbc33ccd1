"""Ground-truth planar-quadrotor world: same ODE as the controller's model
(models/quadrotor.py) integrated with RK4 at a finer timestep. The world
is the MIXER + rotors: the (F, D) command is mixed to per-rotor thrusts
f_{l,r} = (F ± D)/2, each clamped to [0, f_max] (the model is unclamped —
commands outside the achievable rotor envelope are part of the deliberate
model-plant gap, like the torque clamp in the pendulum family)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class QuadrotorParams:
    mass: float = 0.8
    inertia: float = 0.005
    arm: float = 0.17
    gravity: float = 9.81
    max_thrust: float = 8.0        # per rotor (N); hover needs m·g/2 ≈ 3.9 N
    timestep: float = 1.0 / 240.0  # 4 physics steps per 1/60 s control cycle
                                   # (and exactly 4 per model dt = 1/60)
    control_period: float = 1.0 / 60.0
    sim_end: float = 10.0001
    init_x: float = -1.0           # start offset; goal is the config's target
    init_z: float = 0.0

    @property
    def n_axes(self) -> int:  # world-adapter API parity
        return 2

    @property
    def state_dim(self) -> int:
        return 6

    @property
    def steps_per_control(self) -> int:
        import math

        return math.ceil(self.control_period / self.timestep - 1e-9)

    def num_control_steps(self) -> int:
        import math

        per_cycle = self.steps_per_control * self.timestep
        return math.ceil((self.sim_end - self.timestep) / per_cycle)


class QuadrotorState(NamedTuple):
    px: jax.Array
    pz: jax.Array
    th: jax.Array
    vx: jax.Array
    vz: jax.Array
    om: jax.Array
    time: jax.Array

    @property
    def x(self) -> jax.Array:
        return jnp.stack([self.px, self.pz, self.th, self.vx, self.vz, self.om])


@dataclass(frozen=True)
class QuadrotorWorld:
    params: QuadrotorParams

    def _accels(self, th, f1, f2):
        """Accelerations from per-rotor thrusts (f1 = left, f2 = right)."""
        p = self.params
        f_tot = f1 + f2
        ax = f_tot * jnp.sin(th) / p.mass
        az = f_tot * jnp.cos(th) / p.mass - p.gravity
        al = p.arm * (f1 - f2) / p.inertia
        return ax, az, al

    def physics_step(self, s: QuadrotorState, u: jax.Array) -> QuadrotorState:
        p = self.params
        h = p.timestep
        # mixer: (F, D) command → per-rotor thrusts, clamped to the envelope
        F, D = u[..., 0], u[..., 1]
        u1 = jnp.clip(0.5 * (F + D), 0.0, p.max_thrust)
        u2 = jnp.clip(0.5 * (F - D), 0.0, p.max_thrust)

        def deriv(px, pz, th, vx, vz, om):
            ax, az, al = self._accels(th, u1, u2)
            return vx, vz, om, ax, az, al

        y = (s.px, s.pz, s.th, s.vx, s.vz, s.om)
        k1 = deriv(*y)
        k2 = deriv(*(yi + 0.5 * h * ki for yi, ki in zip(y, k1)))
        k3 = deriv(*(yi + 0.5 * h * ki for yi, ki in zip(y, k2)))
        k4 = deriv(*(yi + h * ki for yi, ki in zip(y, k3)))
        px, pz, th, vx, vz, om = (
            yi + (h / 6.0) * (a + 2 * b + 2 * c + d)
            for yi, a, b, c, d in zip(y, k1, k2, k3, k4)
        )
        return QuadrotorState(px=px, pz=pz, th=th, vx=vx, vz=vz, om=om,
                              time=s.time + h)

    def reset(self) -> QuadrotorState:
        p = self.params
        z = jnp.float32(0.0)
        return QuadrotorState(
            px=jnp.float32(p.init_x), pz=jnp.float32(p.init_z),
            th=z, vx=z, vz=z, om=z, time=jnp.float32(p.timestep),
        )

    def simulate(self, s: QuadrotorState, u: jax.Array) -> tuple[QuadrotorState, jax.Array]:
        done = s.time >= self.params.sim_end
        new = s
        for _ in range(self.params.steps_per_control):
            new = self.physics_step(new, u)
        new = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), s, new)
        return new, done

    def step(self, s: QuadrotorState, u: jax.Array) -> QuadrotorState:
        return self.physics_step(s, u)

    def get_x(self, s: QuadrotorState) -> jax.Array:
        return s.x

    def from_x(self, x: jax.Array, time: float) -> QuadrotorState:
        return QuadrotorState(
            px=x[0], pz=x[1], th=x[2], vx=x[3], vz=x[4], om=x[5],
            time=jnp.float32(time),
        )
