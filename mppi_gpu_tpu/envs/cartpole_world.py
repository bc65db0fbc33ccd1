"""Ground-truth cart-pole world: same coupled ODE as the controller's model
(models/cartpole.py) integrated with RK4 at a 10× finer timestep, plus a
hard track limit (cart clamped at ±track_limit with velocity zeroing)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CartPoleParams:
    cart_mass: float = 1.0
    pole_mass: float = 0.1
    pole_length: float = 0.5
    gravity: float = 9.81
    max_force: float = 10.0
    track_limit: float = 2.4
    timestep: float = 0.005
    control_period: float = 1.0 / 60.0
    sim_end: float = 10.0001
    init_theta: float = 0.15  # start tilted: the controller must catch it

    @property
    def n_axes(self) -> int:
        return 1

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


class CartPoleState(NamedTuple):
    p: jax.Array
    th: jax.Array
    pd: jax.Array
    thd: jax.Array
    time: jax.Array

    @property
    def x(self) -> jax.Array:
        return jnp.stack([self.p, self.th, self.pd, self.thd])


@dataclass(frozen=True)
class CartPoleWorld:
    params: CartPoleParams

    def _accels(self, th, thd, u):
        pp = self.params
        total = pp.cart_mass + pp.pole_mass
        s, c = jnp.sin(th), jnp.cos(th)
        a = (u + pp.pole_mass * pp.pole_length * thd**2 * s) / total
        thdd = (pp.gravity * s - c * a) / (
            pp.pole_length * (4.0 / 3.0 - pp.pole_mass * c**2 / total)
        )
        pdd = a - pp.pole_mass * pp.pole_length * thdd * c / total
        return pdd, thdd

    def physics_step(self, s: CartPoleState, u: jax.Array) -> CartPoleState:
        pp = self.params
        h = pp.timestep
        u0 = jnp.clip(u[..., 0], -pp.max_force, pp.max_force)

        def deriv(p, th, pd, thd):
            pdd, thdd = self._accels(th, thd, u0)
            return pd, thd, pdd, thdd

        y = (s.p, s.th, s.pd, s.thd)
        k1 = deriv(*y)
        k2 = deriv(*(yi + 0.5 * h * ki for yi, ki in zip(y, k1)))
        k3 = deriv(*(yi + 0.5 * h * ki for yi, ki in zip(y, k2)))
        k4 = deriv(*(yi + h * ki for yi, ki in zip(y, k3)))
        p, th, pd, thd = (
            yi + (h / 6.0) * (a + 2 * b + 2 * c + d)
            for yi, a, b, c, d in zip(y, k1, k2, k3, k4)
        )
        # hard track limit: clamp cart, zero its velocity at the stop
        hit = jnp.abs(p) > pp.track_limit
        p = jnp.clip(p, -pp.track_limit, pp.track_limit)
        pd = jnp.where(hit, 0.0, pd)
        return CartPoleState(p=p, th=th, pd=pd, thd=thd, time=s.time + h)

    def reset(self) -> CartPoleState:
        pp = self.params
        z = jnp.float32(0.0)
        return CartPoleState(
            p=z, th=jnp.float32(pp.init_theta), pd=z, thd=z,
            time=jnp.float32(pp.timestep),
        )

    def simulate(self, s: CartPoleState, u: jax.Array) -> tuple[CartPoleState, jax.Array]:
        done = s.time >= self.params.sim_end
        new = s
        for _ in range(self.params.steps_per_control):
            new = self.physics_step(new, u)
        new = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), s, new)
        return new, done

    def step(self, s: CartPoleState, u: jax.Array) -> CartPoleState:
        return self.physics_step(s, u)

    def get_x(self, s: CartPoleState) -> jax.Array:
        return s.x

    def from_x(self, x: jax.Array, time: float) -> CartPoleState:
        return CartPoleState(
            p=x[0], th=x[1], pd=x[2], thd=x[3], time=jnp.float32(time)
        )
