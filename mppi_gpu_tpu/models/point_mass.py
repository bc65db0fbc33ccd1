"""Analytic LTI point-mass (double-integrator) dynamics.

Semantics match the reference's device model (reference
src/point_mass_gpu.cu:97-106 with host-set gains src/point_mass.cu:46-51):
state ``x = [q_0..q_{a-1}, qd_0..qd_{a-1}]`` (positions then velocities),
per action dim ``i``:

    q_i'  = q_i + dt * qd_i + (dt^2 / 2) * u_i
    qd_i' =            qd_i +  dt        * u_i

``u`` here is the *effective* action (nominal + sampled noise); MPPI adds the
noise before calling ``step``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass


@register_dataclass
@dataclass(frozen=True)
class PointMassLTI:
    """Double integrator in ``action_dim`` independent axes (1D/2D/3D/...)."""

    dt: jax.Array  # scalar, traced (allows dt sweeps under one jit)
    state_dim: int = field(metadata=dict(static=True), default=2)
    action_dim: int = field(metadata=dict(static=True), default=1)

    @staticmethod
    def create(dt: float, action_dim: int) -> "PointMassLTI":
        return PointMassLTI(
            dt=jnp.float32(dt), state_dim=2 * action_dim, action_dim=action_dim
        )

    def step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        a = self.action_dim
        q, qd = x[..., :a], x[..., a:]
        dt = self.dt
        q1 = q + dt * qd + (0.5 * dt * dt) * u
        qd1 = qd + dt * u
        return jnp.concatenate([q1, qd1], axis=-1)

    def gains(self) -> tuple[jax.Array, jax.Array]:
        """(x_gain [1, dt, 0, 1], u_gain [dt²/2, dt]) — the reference's
        parameterization (src/point_mass.cu:46-51), used by the Pallas kernel
        and the model-mismatch harness."""
        dt = self.dt
        x_gain = jnp.stack([jnp.ones_like(dt), dt, jnp.zeros_like(dt), jnp.ones_like(dt)])
        u_gain = jnp.stack([0.5 * dt * dt, dt])
        return x_gain, u_gain
