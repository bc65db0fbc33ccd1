"""Out-of-tree fused family: kinematic bicycle (front-steer car).

This example is the worked template for the PUBLIC fused-family extension
API (``mppi_gpu_tpu.register_family``). Everything here lives in USER code —
nothing in the package is edited:

  1. ``BicycleDynamics`` / ``BicycleWaypointCost`` — ordinary scan-path
     extensions (the ``Dynamics`` protocol + the ``Cost`` protocol). These
     alone already give a working controller on ANY backend='scan' device.
  2. ``BicycleFamily`` — the fused-kernel twin of the pair, registered with
     ``@register_family``: ~60 lines of tile math that teach the single-pass
     Pallas kernel (and kernels A/B, the fleet kernel, the sharded path, the
     noise-dump kernel — all shared machinery) to integrate this model
     on-chip. After registration, backend='auto' resolves the pair to the
     fused path on TPU exactly like the eight built-in families.

The model: rear-axle kinematic bicycle with velocity drag,

    ṗx = v·cos θ      θ̇ = v·tan δ / L
    ṗy = v·sin θ      v̇ = a − c·v

state ``x = [px, py, θ, v]``, action ``u = [a, δ]`` (acceleration, steer
angle), RK2-midpoint integration — the kernel's ``step`` mirrors
``BicycleDynamics.step`` expression-for-expression, which is what makes the
host-twin oracle test (tests/test_custom_family.py) exact.

Run:  python examples/custom_family.py [--steps 120] [--samples 1024]
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass

from mppi_gpu_tpu import MPPIConfig, MPPIController, register_family

# ---------------------------------------------------------------------------
# 1) scan-path extension: an ordinary Dynamics + Cost pair (pure JAX).
# ---------------------------------------------------------------------------


@register_dataclass
@dataclass(frozen=True)
class BicycleDynamics:
    dt: jax.Array
    wheelbase: jax.Array     # L
    drag: jax.Array          # c
    state_dim: int = field(metadata=dict(static=True), default=4)
    action_dim: int = field(metadata=dict(static=True), default=2)

    @staticmethod
    def create(dt: float, wheelbase: float = 0.5, drag: float = 0.3):
        return BicycleDynamics(
            dt=jnp.float32(dt), wheelbase=jnp.float32(wheelbase),
            drag=jnp.float32(drag),
        )

    def _deriv(self, x, u):
        th, v = x[..., 2], x[..., 3]
        acc, steer = u[..., 0], u[..., 1]
        # tan via sin/cos so the Pallas twin can use the identical expression
        # (Mosaic has sin/cos/divide; keeping both sides token-identical is
        # what makes the fused kernel bit-faithful to this model)
        tan_d = jnp.sin(steer) / jnp.cos(steer)
        return jnp.stack(
            [
                v * jnp.cos(th),
                v * jnp.sin(th),
                v * tan_d / self.wheelbase,
                acc - self.drag * v,
            ],
            axis=-1,
        )

    def step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        # RK2 midpoint — the same integrator every built-in family uses
        h = self.dt
        x_m = x + 0.5 * h * self._deriv(x, u)
        return x + h * self._deriv(x_m, u)


@register_dataclass
@dataclass(frozen=True)
class BicycleWaypointCost:
    """w = [w_pos, w_vel]: quadratic distance to the (gx, gy) waypoint plus a
    cruise-speed term (v − v_ref)² — wrap-free, one multiply per state dim."""

    w: jax.Array        # (2,)
    goal: jax.Array     # (2,) waypoint position
    v_ref: jax.Array    # scalar cruise speed
    lambda_: jax.Array
    inv_s: jax.Array    # (2,)

    def _state(self, x: jax.Array) -> jax.Array:
        dx = x[..., 0] - self.goal[0]
        dy = x[..., 1] - self.goal[1]
        dv = x[..., 3] - self.v_ref
        return self.w[0] * (dx * dx + dy * dy) + self.w[1] * dv * dv

    def step(self, x_next, u, eps):
        ctrl = self.lambda_ * jnp.sum(u * self.inv_s * eps, axis=-1)
        return ctrl + self._state(x_next)

    def final(self, x):
        return self._state(x)


# ---------------------------------------------------------------------------
# 2) fused-kernel extension: the family, registered from user code.
# ---------------------------------------------------------------------------


@register_family
class BicycleFamily:
    """Fused Pallas family for (BicycleDynamics, BicycleWaypointCost).

    A=2 action dims → G=4 rollout groups per (8, KB) tile. The two action
    rows of each group are duplicated onto both rows (the built-in unicycle
    family's ``pair_dup`` pattern) and the state cost is counted once per
    group via the ``even`` row mask — the shared per-group sublane reduction
    sums each group's A rows.
    """

    name = "bicycle-demo"
    NP = 13  # sigma, inv_s, w_pos, w_vel, gx, gy, v_ref, 1/L, drag, x0 (4)
    _WPOS, _WVEL, _GX, _GY, _VREF, _INVL, _DRAG, _X0 = 2, 3, 4, 5, 6, 7, 8, 9

    @staticmethod
    def supports(dyn, cost) -> bool:
        return isinstance(dyn, BicycleDynamics) and type(cost) is BicycleWaypointCost

    @classmethod
    def pack(cls, dyn, cost, x0, sigma, plan, tileA):
        x0 = jnp.broadcast_to(x0, (4,)).astype(jnp.float32)
        w = cost.w.astype(jnp.float32)
        g = cost.goal.astype(jnp.float32)
        return jnp.stack(
            [
                tileA(sigma), tileA(cost.inv_s),
                tileA(w[0]), tileA(w[1]), tileA(g[0]), tileA(g[1]),
                tileA(cost.v_ref), tileA(1.0 / dyn.wheelbase), tileA(dyn.drag),
                tileA(x0[0]), tileA(x0[1]), tileA(x0[2]), tileA(x0[3]),
            ],
            axis=1,
        )  # (SUB, NP)

    @classmethod
    def build(cls, p_ref, scal_ref, plan):
        SUB, G, KB = 8, plan.G, plan.KB
        dt = scal_ref[0, 0]
        col = lambda i: p_ref[:, i:i + 1]  # noqa: E731
        w_pos, w_vel = col(cls._WPOS), col(cls._WVEL)
        gx, gy, v_ref = col(cls._GX), col(cls._GY), col(cls._VREF)
        inv_l, drag = col(cls._INVL), col(cls._DRAG)
        row = jax.lax.broadcasted_iota(jnp.int32, (SUB, KB), 0)
        even = (row % 2 == 0).astype(jnp.float32)

        def pair_dup(u_eff, off):
            rows = []
            for g in range(G):
                r = u_eff[g * 2 + off:g * 2 + off + 1]
                rows.append(r)
                rows.append(r)
            return jnp.concatenate(rows, axis=0)

        def deriv(s, acc, tan_d):
            px, py, th, v = s
            return (
                v * jnp.cos(th),
                v * jnp.sin(th),
                v * tan_d * inv_l,
                acc - drag * v,
            )

        def state_cost(s):
            px, py, th, v = s
            dx, dy, dv = px - gx, py - gy, v - v_ref
            return even * (w_pos * (dx * dx + dy * dy) + w_vel * dv * dv)

        def carry0():
            return tuple(
                jnp.broadcast_to(col(cls._X0 + i), (SUB, KB)) for i in range(4)
            )

        def step(state, u_eff):
            acc = pair_dup(u_eff, 0)
            steer = pair_dup(u_eff, 1)
            tan_d = jnp.sin(steer) / jnp.cos(steer)
            # RK2 midpoint — mirrors BicycleDynamics.step exactly
            d1 = deriv(state, acc, tan_d)
            s_m = tuple(state[i] + 0.5 * dt * d1[i] for i in range(4))
            d2 = deriv(s_m, acc, tan_d)
            state = tuple(state[i] + dt * d2[i] for i in range(4))
            return state, state_cost(state)

        def final(state):
            return state_cost(state)

        return carry0, step, final


# ---------------------------------------------------------------------------
# demo: receding-horizon drive to a waypoint, model-as-world.
# ---------------------------------------------------------------------------


def make_controller(samples: int, horizon: int = 40, backend: str = "auto"):
    cfg = MPPIConfig(
        env="bicycle-demo", samples=samples, state_dim=4, action_dim=2,
        horizon=horizon, dt=0.05, lambda_=0.4,
        noise=(0.8, 0.5), init_act=(0.0, 0.0), max_a=(2.0, 0.6),
        goal=(3.0, 1.5, 0.0, 0.0), cost_w=(1.0, 1.0, 0.0, 0.0),
    )
    dyn = BicycleDynamics.create(cfg.dt)
    cost = BicycleWaypointCost(
        # v_ref=0: the speed term doubles as a brake, parking the car at the
        # waypoint instead of cruising past it
        w=jnp.asarray([2.0, 0.3]), goal=jnp.asarray([3.0, 1.5]),
        v_ref=jnp.float32(0.0), lambda_=jnp.float32(cfg.lambda_),
        inv_s=jnp.asarray([1.0, 1.0]),
    )
    return MPPIController(cfg, dyn, cost, rollout_backend=backend), dyn


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--samples", type=int, default=1024)
    p.add_argument("--backend", default="auto",
                   choices=("auto", "scan", "pallas", "pallas-interpret"))
    args = p.parse_args(argv)

    ctrl, dyn = make_controller(args.samples, backend=args.backend)
    print(f"backend resolved: {ctrl.rollout_backend}")
    x = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    U = ctrl.init_action_seq()
    key = ctrl.init_key()
    for step in range(args.steps):
        res = ctrl.solve_auto(x, U, key, step)
        x, U = dyn.step(x, res.action), res.u_next
    px, py = float(x[0]), float(x[1])
    d = ((px - 3.0) ** 2 + (py - 1.5) ** 2) ** 0.5
    print(f"final pose ({px:.3f}, {py:.3f})  dist-to-waypoint {d:.3f} m")
    ok = d < 0.3
    print("reached waypoint" if ok else "did NOT reach waypoint")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
