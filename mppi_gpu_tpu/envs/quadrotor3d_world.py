"""Ground-truth 3-D quadrotor world: the same rigid-body ODE as the
controller's model (models/quadrotor3d.py) behind the MIXER + rotors —
the [F, τx, τy, τz] command is inverted to four per-rotor thrusts
("+" configuration, arm r, yaw drag coefficient κ), each clamped to
[0, f_max], and the achieved wrench is reconstituted from the clamped
thrusts. Integrated with RK4 at a finer timestep, quaternion normalized
once per physics step. The model is unclamped and coarser (RK2 at the
control period) — the usual deliberate model-plant gap."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Quadrotor3DParams:
    mass: float = 0.8
    inertia: tuple[float, float, float] = (0.005, 0.005, 0.009)
    arm: float = 0.17              # rotor arm length r (m)
    kappa: float = 0.016           # rotor drag torque per thrust (m)
    gravity: float = 9.81
    max_thrust: float = 8.0        # per rotor (N); hover needs m·g/4 ≈ 2 N
    timestep: float = 1.0 / 240.0  # 4 physics steps per 1/60 s control cycle
    control_period: float = 1.0 / 60.0
    sim_end: float = 10.0001
    init_pos: tuple[float, float, float] = (-1.0, 0.0, 0.5)

    @property
    def n_axes(self) -> int:  # world-adapter API parity
        return 3

    @property
    def state_dim(self) -> int:
        return 13

    @property
    def steps_per_control(self) -> int:
        import math

        return math.ceil(self.control_period / self.timestep - 1e-9)

    def num_control_steps(self) -> int:
        import math

        per_cycle = self.steps_per_control * self.timestep
        return math.ceil((self.sim_end - self.timestep) / per_cycle)


class Quadrotor3DState(NamedTuple):
    p: jax.Array    # (3,) world position
    q: jax.Array    # (4,) unit quaternion body→world (w, x, y, z)
    v: jax.Array    # (3,) world linear velocity
    om: jax.Array   # (3,) body angular velocity
    time: jax.Array

    @property
    def x(self) -> jax.Array:
        return jnp.concatenate([self.p, self.q, self.v, self.om])


def mix_to_rotors(u: jax.Array, arm: float, kappa: float) -> jax.Array:
    """[F, τx, τy, τz] → (4,) per-rotor thrusts, "+" configuration
    (f1 front +x CCW, f2 left +y CW, f3 back −x CCW, f4 right −y CW)."""
    F, tx, ty, tz = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    qf, qx, qy, qz = F / 4.0, tx / (2.0 * arm), ty / (2.0 * arm), tz / (4.0 * kappa)
    return jnp.stack([qf - qy + qz, qf + qx - qz, qf + qy + qz, qf - qx - qz], axis=-1)


def quat_to_body_axes(q, scale: float = 1.0):
    """World-frame body x̂ and ŷ (columns of R(q)), numpy-friendly — the
    shared attitude-drawing helper for the viewer and the examples.
    `q` is (qw, qx, qy, qz); returns two length-3 arrays scaled by
    `scale`."""
    import numpy as np

    qw, qx, qy, qz = (float(v) for v in q)
    bx = np.array([1 - 2 * (qy * qy + qz * qz),
                   2 * (qx * qy + qw * qz),
                   2 * (qx * qz - qw * qy)]) * scale
    by = np.array([2 * (qx * qy - qw * qz),
                   1 - 2 * (qx * qx + qz * qz),
                   2 * (qy * qz + qw * qx)]) * scale
    return bx, by


def rotors_to_wrench(f: jax.Array, arm: float, kappa: float) -> jax.Array:
    """(4,) rotor thrusts → achieved [F, τx, τy, τz] (inverse of the mixer)."""
    f1, f2, f3, f4 = f[..., 0], f[..., 1], f[..., 2], f[..., 3]
    return jnp.stack(
        [
            f1 + f2 + f3 + f4,
            arm * (f2 - f4),
            arm * (f3 - f1),
            kappa * (f1 - f2 + f3 - f4),
        ],
        axis=-1,
    )


@dataclass(frozen=True)
class Quadrotor3DWorld:
    params: Quadrotor3DParams

    def _derivs(self, q, v, om, wrench):
        """Same rigid-body ODE as Quadrotor3DDynamics.derivs
        (models/quadrotor3d.py), on the ACHIEVED (post-clamp) wrench."""
        p = self.params
        qw, qx, qy, qz = q[0], q[1], q[2], q[3]
        wx, wy, wz = om[0], om[1], om[2]
        fm = wrench[0] / p.mass
        acc = jnp.stack(
            [
                2.0 * (qx * qz + qw * qy) * fm,
                2.0 * (qy * qz - qw * qx) * fm,
                (1.0 - 2.0 * (qx * qx + qy * qy)) * fm - p.gravity,
            ]
        )
        qdot = 0.5 * jnp.stack(
            [
                -(qx * wx + qy * wy + qz * wz),
                qw * wx + qy * wz - qz * wy,
                qw * wy + qz * wx - qx * wz,
                qw * wz + qx * wy - qy * wx,
            ]
        )
        jx, jy, jz = p.inertia
        omdot = jnp.stack(
            [
                (wrench[1] - (jz - jy) * wy * wz) / jx,
                (wrench[2] - (jx - jz) * wz * wx) / jy,
                (wrench[3] - (jy - jx) * wx * wy) / jz,
            ]
        )
        return qdot, acc, omdot

    def physics_step(self, s: Quadrotor3DState, u: jax.Array) -> Quadrotor3DState:
        p = self.params
        h = p.timestep
        f = jnp.clip(
            mix_to_rotors(jnp.asarray(u, jnp.float32), p.arm, p.kappa),
            0.0, p.max_thrust,
        )
        wrench = rotors_to_wrench(f, p.arm, p.kappa)

        def deriv(y):
            pp, q, v, om = y
            qd, a, wd = self._derivs(q, v, om, wrench)
            return v, qd, a, wd

        y = (s.p, s.q, s.v, s.om)
        add = lambda y, k, c: tuple(yi + c * ki for yi, ki in zip(y, k))  # noqa: E731
        k1 = deriv(y)
        k2 = deriv(add(y, k1, 0.5 * h))
        k3 = deriv(add(y, k2, 0.5 * h))
        k4 = deriv(add(y, k3, h))
        pp, q, v, om = (
            yi + (h / 6.0) * (a + 2 * b + 2 * c + d)
            for yi, a, b, c, d in zip(y, k1, k2, k3, k4)
        )
        q = q * jax.lax.rsqrt(jnp.sum(q * q))
        return Quadrotor3DState(p=pp, q=q, v=v, om=om, time=s.time + h)

    def reset(self) -> Quadrotor3DState:
        p = self.params
        return Quadrotor3DState(
            p=jnp.asarray(p.init_pos, jnp.float32),
            q=jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
            v=jnp.zeros(3, jnp.float32),
            om=jnp.zeros(3, jnp.float32),
            time=jnp.float32(p.timestep),
        )

    def simulate(self, s: Quadrotor3DState, u: jax.Array) -> tuple[Quadrotor3DState, jax.Array]:
        done = s.time >= self.params.sim_end
        new = s
        for _ in range(self.params.steps_per_control):
            new = self.physics_step(new, u)
        new = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), s, new)
        return new, done

    def step(self, s: Quadrotor3DState, u: jax.Array) -> Quadrotor3DState:
        return self.physics_step(s, u)

    def get_x(self, s: Quadrotor3DState) -> jax.Array:
        return s.x

    def from_x(self, x: jax.Array, time: float) -> Quadrotor3DState:
        return Quadrotor3DState(
            p=x[0:3], q=x[3:7], v=x[7:10], om=x[10:13],
            time=jnp.float32(time),
        )
