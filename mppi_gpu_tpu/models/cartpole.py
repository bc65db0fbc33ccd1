"""Cart-pole dynamics — third model family, and the first with COUPLED
nonlinear dynamics (the point mass is linear-decoupled, the pendulum is
nonlinear but 1-DOF). State ``x = [p, θ, ṗ, θ̇]`` with θ from upright,
action ``u`` = horizontal force on the cart.

Classic frictionless cart-pole equations (pole pivoting on the cart):

    a   = (u + m_p l θ̇² sin θ) / (m_c + m_p)
    θ̈  = (g sin θ − cos θ · a) / (l (4/3 − m_p cos²θ / (m_c + m_p)))
    p̈  = a − m_p l θ̈ cos θ / (m_c + m_p)

integrated with one RK2 (midpoint) step of ``dt`` per horizon step; the
ground-truth world (envs/cartpole_world.py) uses RK4 at a 10× finer timestep
— the same deliberate integration-level model-plant gap as the other
families."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass


@register_dataclass
@dataclass(frozen=True)
class CartPoleDynamics:
    dt: jax.Array
    cart_mass: jax.Array
    pole_mass: jax.Array
    pole_length: jax.Array  # half-length l of the pole
    gravity: jax.Array
    state_dim: int = field(metadata=dict(static=True), default=4)
    action_dim: int = field(metadata=dict(static=True), default=1)

    @staticmethod
    def create(
        dt: float,
        cart_mass: float = 1.0,
        pole_mass: float = 0.1,
        pole_length: float = 0.5,
        gravity: float = 9.81,
    ) -> "CartPoleDynamics":
        return CartPoleDynamics(
            dt=jnp.float32(dt), cart_mass=jnp.float32(cart_mass),
            pole_mass=jnp.float32(pole_mass), pole_length=jnp.float32(pole_length),
            gravity=jnp.float32(gravity),
        )

    def accel(self, th, thd, u):
        """Returns (p̈, θ̈)."""
        mc, mp, l, g = self.cart_mass, self.pole_mass, self.pole_length, self.gravity
        total = mc + mp
        s, c = jnp.sin(th), jnp.cos(th)
        a = (u + mp * l * thd**2 * s) / total
        thdd = (g * s - c * a) / (l * (4.0 / 3.0 - mp * c**2 / total))
        pdd = a - mp * l * thdd * c / total
        return pdd, thdd

    def step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        p, th, pd, thd = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
        u0 = u[..., 0]
        h = self.dt
        # RK2 midpoint
        pdd1, thdd1 = self.accel(th, thd, u0)
        th_m = th + 0.5 * h * thd
        thd_m = thd + 0.5 * h * thdd1
        pdd2, thdd2 = self.accel(th_m, thd_m, u0)
        pd_m = pd + 0.5 * h * pdd1
        return jnp.stack(
            [p + h * pd_m, th + h * thd_m, pd + h * pdd2, thd + h * thdd2],
            axis=-1,
        )
