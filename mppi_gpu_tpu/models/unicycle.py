"""Unicycle / differential-drive robot — the seventh model family, and the
domain the MPPI algorithm was originally built for (aggressive ground-vehicle
driving; the reference's roadmap is pluggable models, reference README TODO +
src/controller_base.cpp).

State ``x = [px, py, θ]`` (planar pose), action ``u = [v, ω]`` (commanded
forward speed and turn rate — the differential-drive kinematics):

    ṗx = v·cos θ,   ṗy = v·sin θ,   θ̇ = ω

integrated with one RK2 (midpoint) step of ``dt`` per horizon step: the
heading advances to the midpoint angle first, so arcs are second-order
accurate (exact for ω→0). First family whose STATE dim (3) differs from
2·action_dim — the config schema handles it unchanged. The ground-truth
world (envs/unicycle_world.py) integrates the same kinematics with RK4 at a
10× finer timestep, preserving the deliberate model-plant gap every family
carries."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass


@register_dataclass
@dataclass(frozen=True)
class UnicycleDynamics:
    dt: jax.Array
    state_dim: int = field(metadata=dict(static=True), default=3)
    action_dim: int = field(metadata=dict(static=True), default=2)

    @staticmethod
    def create(dt: float) -> "UnicycleDynamics":
        return UnicycleDynamics(dt=jnp.float32(dt))

    def step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        px, py, th = x[..., 0], x[..., 1], x[..., 2]
        v, w = u[..., 0], u[..., 1]
        h = self.dt
        th_m = th + 0.5 * h * w          # midpoint heading
        return jnp.stack(
            [
                px + h * v * jnp.cos(th_m),
                py + h * v * jnp.sin(th_m),
                th + h * w,
            ],
            axis=-1,
        )
