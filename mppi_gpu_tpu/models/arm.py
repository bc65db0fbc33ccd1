"""Two-link planar manipulator — the eighth model family: a torque-driven
rigid-body arm (the classic reaching benchmark), and the first family with a
configuration-dependent mass matrix (the reference's roadmap is pluggable
models, reference README TODO + src/controller_base.cpp; its only model is
the LTI point mass).

State ``x = [q1, q2, qd1, qd2]`` (shoulder angle from the +x axis, elbow
angle relative to link 1, joint rates), action ``u = [τ1, τ2]`` (joint
torques). Dynamics are the standard manipulator equations

    M(q)·q̈ + C(q, q̇)·q̇ + φ(q) + b·q̇ = τ

with the closed-form 2×2 inverse of M(q):

    M = [A + 2B·c2   D + B·c2]      C·q̇ = [−B·s2·(2·q̇1·q̇2 + q̇2²)]
        [D + B·c2    D       ]            [ B·s2·q̇1²            ]

    φ = [G1·cos q1 + G2·cos(q1+q2), G2·cos(q1+q2)]

where A = I1 + I2 + m1·lc1² + m2·(l1² + lc2²), B = m2·l1·lc2,
D = I2 + m2·lc2², G1 = (m1·lc1 + m2·l1)·g, G2 = m2·lc2·g — five
constants precomputed at construction (they are also exactly what the
fused Pallas family packs). Integration is one RK2-midpoint step of ``dt``
per horizon step, like every analytic family. Gravity acts in the plane
(−y), so this is a vertical reacher: the arm must fight its own weight.

The ground-truth world (envs/arm_world.py) integrates the same equations
with RK4 at a ~3.3× finer timestep — the integration-level model-plant
gap every family carries."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass


@register_dataclass
@dataclass(frozen=True)
class TwoLinkArmDynamics:
    dt: jax.Array
    A: jax.Array        # inertia constant (see module docstring)
    B: jax.Array        # m2·l1·lc2 — the c2/s2 coupling coefficient
    D: jax.Array        # I2 + m2·lc2² (= M22)
    G1: jax.Array       # (m1·lc1 + m2·l1)·g
    G2: jax.Array       # m2·lc2·g
    damping: jax.Array  # viscous joint damping b
    max_rate: jax.Array  # joint-rate saturation (rad/s) — physical motor
                         # limit, and what keeps extreme noise draws from
                         # driving the stiff RK2 step to NaN (a NaN rollout
                         # cost would poison β for the whole solve)
    l1: jax.Array       # link lengths (forward kinematics / cost)
    l2: jax.Array
    state_dim: int = field(metadata=dict(static=True), default=4)
    action_dim: int = field(metadata=dict(static=True), default=2)

    @staticmethod
    def create(
        dt: float,
        m1: float = 1.0,
        m2: float = 1.0,
        l1: float = 0.5,
        l2: float = 0.5,
        damping: float = 0.05,
        gravity: float = 9.81,
        max_rate: float = 12.0,
    ) -> "TwoLinkArmDynamics":
        lc1, lc2 = 0.5 * l1, 0.5 * l2
        i1, i2 = m1 * l1 * l1 / 12.0, m2 * l2 * l2 / 12.0
        return TwoLinkArmDynamics(
            dt=jnp.float32(dt),
            A=jnp.float32(i1 + i2 + m1 * lc1 * lc1 + m2 * (l1 * l1 + lc2 * lc2)),
            B=jnp.float32(m2 * l1 * lc2),
            D=jnp.float32(i2 + m2 * lc2 * lc2),
            G1=jnp.float32((m1 * lc1 + m2 * l1) * gravity),
            G2=jnp.float32(m2 * lc2 * gravity),
            damping=jnp.float32(damping),
            max_rate=jnp.float32(max_rate),
            l1=jnp.float32(l1),
            l2=jnp.float32(l2),
        )

    def _deriv(self, x: jax.Array, u: jax.Array) -> jax.Array:
        q1, q2 = x[..., 0], x[..., 1]
        qd1, qd2 = x[..., 2], x[..., 3]
        t1, t2 = u[..., 0], u[..., 1]
        s2, c2 = jnp.sin(q2), jnp.cos(q2)
        c1, c12 = jnp.cos(q1), jnp.cos(q1 + q2)
        d11 = self.A + 2.0 * self.B * c2
        d12 = self.D + self.B * c2
        # right-hand side τ − C·q̇ − φ − b·q̇
        hs = self.B * s2
        r1 = t1 + hs * (2.0 * qd1 * qd2 + qd2 * qd2) \
            - (self.G1 * c1 + self.G2 * c12) - self.damping * qd1
        r2 = t2 - hs * qd1 * qd1 - self.G2 * c12 - self.damping * qd2
        inv_det = 1.0 / (d11 * self.D - d12 * d12)
        qdd1 = (self.D * r1 - d12 * r2) * inv_det
        qdd2 = (d11 * r2 - d12 * r1) * inv_det
        return jnp.stack([qd1, qd2, qdd1, qdd2], axis=-1)

    def _sat(self, x: jax.Array) -> jax.Array:
        """Joint-rate saturation (applied after each integration stage)."""
        q = x[..., :2]
        qd = jnp.clip(x[..., 2:], -self.max_rate, self.max_rate)
        return jnp.concatenate([q, qd], axis=-1)

    def step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        # RK2 midpoint — the same integrator every analytic family uses —
        # with the rate saturation after each stage
        h = self.dt
        x_m = self._sat(x + 0.5 * h * self._deriv(x, u))
        return self._sat(x + h * self._deriv(x_m, u))

    def end_effector(self, x: jax.Array) -> jax.Array:
        """Forward kinematics: planar end-effector position (..., 2)."""
        q1, q12 = x[..., 0], x[..., 0] + x[..., 1]
        return jnp.stack(
            [
                self.l1 * jnp.cos(q1) + self.l2 * jnp.cos(q12),
                self.l1 * jnp.sin(q1) + self.l2 * jnp.sin(q12),
            ],
            axis=-1,
        )
