"""Pure-JAX ground-truth world (MuJoCo-equivalent point mass).

Role-equivalent to the reference's `PointMassEnv` (src/PointMassEnv.cpp), but
implemented as pure functions over an explicit state so that

  * the whole closed-loop episode (solve + world step, ~600 cycles) can be
    jitted into ONE XLA program via `lax.scan` — no host↔device ping-pong in
    the benchmark path;
  * the interactive per-step mode (matching the reference's loop) still works.

Physics: per-axis linear ODE with RK4 at the MuJoCo timestep — see
`envs/params.py` for the derivation from the reference XMLs. Joint limits are
applied as a hard clamp with velocity zeroing at the stop (an approximation of
MuJoCo's soft limit constraint; trajectories in these tasks stay well inside
±1.4, so the approximation is never active in practice).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mppi_gpu_tpu.envs.params import WorldParams


class WorldState(NamedTuple):
    q: jax.Array      # (n_axes,) positions
    qd: jax.Array     # (n_axes,) velocities
    time: jax.Array   # scalar sim time

    @property
    def x(self) -> jax.Array:
        """Concatenated [qpos, qvel] — the reference's get_x layout
        (PointMassEnv.cpp:190-198)."""
        return jnp.concatenate([self.q, self.qd])


@dataclass(frozen=True)
class PointMassWorld:
    params: WorldParams

    # -- core physics --------------------------------------------------------
    def _accel(self, qd: jax.Array, u: jax.Array) -> jax.Array:
        p = self.params
        return (p.gear * u - p.damping * qd) / p.effective_mass

    def physics_step(self, state: WorldState, u: jax.Array) -> WorldState:
        """One RK4 step of `q̈ = (gear·u − damping·q̇)/m_eff` at `timestep`,
        with ctrl clamped to ±ctrl_range (MuJoCo ctrllimited)."""
        p = self.params
        h = p.timestep
        u = jnp.clip(u, -p.ctrl_range, p.ctrl_range)
        q, qd = state.q, state.qd

        # RK4 on the linear system (dq/dt = qd, dqd/dt = accel)
        k1q, k1v = qd, self._accel(qd, u)
        k2q, k2v = qd + 0.5 * h * k1v, self._accel(qd + 0.5 * h * k1v, u)
        k3q, k3v = qd + 0.5 * h * k2v, self._accel(qd + 0.5 * h * k2v, u)
        k4q, k4v = qd + h * k3v, self._accel(qd + h * k3v, u)
        q_new = q + (h / 6.0) * (k1q + 2 * k2q + 2 * k3q + k4q)
        qd_new = qd + (h / 6.0) * (k1v + 2 * k2v + 2 * k3v + k4v)

        # hard joint-limit clamp (see module docstring)
        hit = jnp.abs(q_new) > p.joint_range
        q_new = jnp.clip(q_new, -p.joint_range, p.joint_range)
        qd_new = jnp.where(hit, 0.0, qd_new)
        return WorldState(q=q_new, qd=qd_new, time=state.time + h)

    # -- reference-env API -----------------------------------------------------
    def reset(self) -> WorldState:
        """Initial state after the reference's warm-up `mj_step`
        (PointMassEnv.cpp:94): at the origin, at rest, time = timestep."""
        n = self.params.n_axes
        return WorldState(
            q=jnp.zeros((n,), jnp.float32),
            qd=jnp.zeros((n,), jnp.float32),
            time=jnp.float32(self.params.timestep),
        )

    def simulate(self, state: WorldState, u: jax.Array) -> tuple[WorldState, jax.Array]:
        """One control cycle: hold `u` and advance 1/60 s of sim time
        (reference simulate(), PointMassEnv.cpp:115-139). Returns
        (new_state, done). `done` mirrors the reference: True once sim time
        has passed sim_end — checked BEFORE stepping."""
        done = state.time >= self.params.sim_end
        new = state
        for _ in range(self.params.steps_per_control):  # static count: unrolled
            new = self.physics_step(new, u)
        new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), state, new
        )
        return new, done

    def step(self, state: WorldState, u: jax.Array) -> WorldState:
        """Single physics step (the reference's `step(x, u)`,
        PointMassEnv.cpp:175-188) — used by the mismatch harness."""
        return self.physics_step(state, u)

    def get_x(self, state: WorldState) -> jax.Array:
        return state.x

    def from_x(self, x: jax.Array, time: float) -> WorldState:
        """Inverse of get_x (checkpoint restore): x = [q, qd]."""
        n = self.params.n_axes
        return WorldState(q=x[:n], qd=x[n:], time=jnp.float32(time))
