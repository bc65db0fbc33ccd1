"""Planar quadrotor (birotor) dynamics — the fourth model family, and the
first with a nonzero nominal action (hover thrust) and coupled rotational/
translational dynamics (the reference's models are all per-axis decoupled;
its roadmap is pluggable models, reference README TODO +
src/controller_base.cpp).

State ``x = [px, pz, θ, vx, vz, ω]``: planar position, tilt (θ=0 level,
positive = right tip down, i.e. thrust vector leans toward +x), linear and
angular velocity.

Action ``u = [F, D]`` — MIXER space, the collective/differential command a
real flight stack feeds its motor mixer: F = f_left + f_right is total
thrust (N), D = f_left − f_right the differential (extra LEFT thrust tips
the right side down, θ̈ > 0 — the proper right-hand-rule torque about +y).
The ground-truth worlds mix (F, D) → per-rotor thrusts
f_{l,r} = (F ± D)/2 and clamp each to [0, f_max]; the model stays
unclamped (part of the deliberate model-plant gap).

Why mixer space and not raw rotor thrusts: MPPI samples iid noise per
action dim. In rotor space that puts σ² of noise on the DIFFERENCE
f_l − f_r, and with θ̈ = r·(f_l − f_r)/I ≈ 34 rad/s² per N, the attitude
random-walks so violently over a 1 s horizon that every rollout is
garbage and the softmin has nothing to pick (measured: hover error never
dropped below ~0.6 m). In mixer space σ_D can be an order of magnitude
smaller than σ_F, which tames the attitude walk while keeping strong
altitude exploration (hover error ~0.1 m with the same sample budget).

    ẍ =  F·sin θ / m
    z̈ =  F·cos θ / m − g
    θ̈ =  r·D / I

(r = rotor arm half-length, I = body inertia about y). Hover is the
nonzero nominal u = (m·g, 0) — this family is what the config's
``init-act`` key exists for. Integrated with one RK2 (midpoint) step of
``dt`` per horizon step, like the other nonlinear families; the
ground-truth world (envs/quadrotor_world.py) integrates the same ODE with
RK4 at a finer timestep after the mix-and-clamp, giving the usual
deliberate model-plant gap."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass


@register_dataclass
@dataclass(frozen=True)
class QuadrotorDynamics:
    dt: jax.Array        # integration step per horizon step
    mass: jax.Array      # m (kg)
    inertia: jax.Array   # I about the body y axis (kg·m²)
    arm: jax.Array       # r — rotor arm half-length (m)
    gravity: jax.Array   # g (m/s²)
    state_dim: int = field(metadata=dict(static=True), default=6)
    action_dim: int = field(metadata=dict(static=True), default=2)

    @staticmethod
    def create(
        dt: float,
        mass: float = 0.8,
        inertia: float = 0.005,
        arm: float = 0.17,
        gravity: float = 9.81,
    ) -> "QuadrotorDynamics":
        return QuadrotorDynamics(
            dt=jnp.float32(dt), mass=jnp.float32(mass),
            inertia=jnp.float32(inertia), arm=jnp.float32(arm),
            gravity=jnp.float32(gravity),
        )

    def accels(self, th: jax.Array, u: jax.Array) -> tuple[jax.Array, ...]:
        """(ẍ, z̈, θ̈) for tilt `th` and mixer command `u = [F, D]`."""
        F, D = u[..., 0], u[..., 1]
        ax = F * jnp.sin(th) / self.mass
        az = F * jnp.cos(th) / self.mass - self.gravity
        al = self.arm * D / self.inertia
        return ax, az, al

    def step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        px, pz, th = x[..., 0], x[..., 1], x[..., 2]
        vx, vz, om = x[..., 3], x[..., 4], x[..., 5]
        h = self.dt
        # RK2 midpoint (command held over the step, like the other families)
        ax1, az1, al1 = self.accels(th, u)
        th_m = th + 0.5 * h * om
        ax2, az2, al2 = self.accels(th_m, u)
        vx_m, vz_m, om_m = vx + 0.5 * h * ax1, vz + 0.5 * h * az1, om + 0.5 * h * al1
        return jnp.stack(
            [
                px + h * vx_m,
                pz + h * vz_m,
                th + h * om_m,
                vx + h * ax2,
                vz + h * az2,
                om + h * al2,
            ],
            axis=-1,
        )
