"""Model-mismatch harness — the analog of the reference's `miss` executable
(reference src/model_missmatch.cpp:123-155): drive the SAME random open-loop
control sequence through (a) the ground-truth world and (b) the controller's
internal analytic LTI model, and save the trajectories side by side. The gap
is the model-plant mismatch MPPI must absorb (the controller model ignores
damping/armature/gear and steps dt=0.1 per horizon step while the world
advances 1/60 s per control cycle).

    python -m mppi_gpu_tpu.miss -c configs/point_mass2d.yaml -o missmatch.csv
"""

from __future__ import annotations

import argparse
import csv
import sys
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.envs.params import WorldParams
from mppi_gpu_tpu.envs.point_mass_world import PointMassWorld
from mppi_gpu_tpu.models.point_mass import PointMassLTI


@dataclass
class MismatchResult:
    traj_model: np.ndarray  # (n+1, s) analytic LTI open-loop
    traj_world: np.ndarray  # (n+1, s) ground-truth world open-loop
    us: np.ndarray          # (n, a)
    pos_dims: int = 0       # leading position dims; 0 = action_dim (the
                            # [q, qd] families); quadrotor3d sets 3

    @property
    def position_rmse(self) -> float:
        a = self.pos_dims or self.us.shape[1]
        d = self.traj_model[:, :a] - self.traj_world[:, :a]
        return float(np.sqrt((d**2).mean()))


def run_mismatch(
    n_axes: int,
    *,
    n_steps: int = 100,
    dt: float = 0.1,
    seed: int = 0,
    world_backend: str = "jax",
) -> MismatchResult:
    rng = np.random.default_rng(seed)
    us = rng.standard_normal((n_steps, n_axes)).astype(np.float32)
    params = WorldParams(n_axes=n_axes)

    # (a) ground-truth world, one control cycle per input. Drive raw physics
    # steps, NOT simulate(): the episode clock would freeze the world after
    # sim_end (10 s) and long excitation runs would compare the model against
    # a frozen plant.
    spc = params.steps_per_control
    if world_backend in ("native", "mujoco"):
        if world_backend == "native":
            from mppi_gpu_tpu.envs.native import NativePointMassWorld

            world = NativePointMassWorld(params)
        else:
            # the reference's actual plant (mj_step) — optional dependency
            from mppi_gpu_tpu.envs.mujoco_world import MujocoPointMassWorld

            world = MujocoPointMassWorld(params)
        traj_world = np.empty((n_steps + 1, 2 * n_axes), np.float32)
        traj_world[0] = world.get_x()
        for t in range(n_steps):
            for _ in range(spc):
                world.step(us[t])
            traj_world[t + 1] = world.get_x()
    else:
        world = PointMassWorld(params)

        @jax.jit
        def world_rollout(us):
            def body(ws, u):
                for _ in range(spc):  # static count: unrolled
                    ws = world.physics_step(ws, u)
                return ws, ws.x

            ws0 = world.reset()
            _, xs = jax.lax.scan(body, ws0, us)
            return jnp.concatenate([ws0.x[None], xs], axis=0)

        traj_world = np.asarray(world_rollout(jnp.asarray(us)))

    # (b) the controller's internal model, open loop at its own dt
    dyn = PointMassLTI.create(dt, n_axes)

    @jax.jit
    def model_rollout(us):
        def body(x, u):
            x1 = dyn.step(x, u)
            return x1, x1

        x0 = jnp.zeros((2 * n_axes,), jnp.float32)
        _, xs = jax.lax.scan(body, x0, us)
        return jnp.concatenate([x0[None], xs], axis=0)

    traj_model = np.asarray(model_rollout(jnp.asarray(us)))
    return MismatchResult(traj_model=traj_model, traj_world=traj_world, us=us)


def run_mismatch_config(
    cfg,
    *,
    n_steps: int = 100,
    seed: int = 0,
    world_backend: str = "jax",
) -> MismatchResult:
    """Model-vs-world mismatch for the non-point-mass families (pendulum,
    cart-pole): drive the SAME random action sequence through the config's
    dynamics model (one step per input, at cfg.dt) and through the
    ground-truth world (raw physics steps covering cfg.dt of sim time per
    input). With the jax world, model and world share the ODE, so the gap
    isolates the integration-level mismatch (coarse RK2 vs fine RK4); with
    `world_backend="mujoco"` the plant is the real engine, the same
    measurement the reference's miss tool makes (model_missmatch.cpp:49-71,
    there point-mass-only)."""
    import jax as _jax

    from mppi_gpu_tpu.envs import (
        is_quadrotor3d_env,
        make_jax_world,
        params_for_config,
    )
    from mppi_gpu_tpu.models import dynamics_for_config

    rng = np.random.default_rng(seed)
    a = cfg.action_dim
    # excitation around the nominal action (hover thrust for the quadrotor,
    # zero for the torque/force families), ±max_a/2 — the same "drive it
    # with noise" excitation the reference's miss tool uses
    # (model_missmatch.cpp:123-155)
    us = (
        np.asarray(cfg.init_act, np.float32)
        + rng.standard_normal((n_steps, a)).astype(np.float32)
        * np.asarray(cfg.max_a, np.float32) * 0.5
    ).astype(np.float32)
    dyn = dynamics_for_config(cfg)
    params = params_for_config(cfg)
    world = make_jax_world(cfg, params)
    phys_steps = max(1, round(cfg.dt / params.timestep))
    ws0 = world.reset()
    x0 = jnp.asarray(ws0.x)

    if world_backend in ("native", "mujoco"):
        from mppi_gpu_tpu.envs import (
            is_arm_env,
            is_cartpole_env,
            is_quadrotor_env,
            is_unicycle_env,
        )

        if is_unicycle_env(cfg.env):
            raise ValueError(
                "the unicycle family is kinematic and has no native/MuJoCo "
                "twin; use --world jax"
            )
        if is_arm_env(cfg.env) and world_backend == "native":
            raise ValueError(
                "no native C++ twin is wired for the arm family; "
                "use --world jax or --world mujoco"
            )
        if world_backend == "native":
            from mppi_gpu_tpu.envs.native import (
                NativeCartPoleWorld,
                NativePendulumWorld,
                NativeQuadrotor3DWorld,
                NativeQuadrotorWorld,
            )

            if is_quadrotor3d_env(cfg.env):
                cls = NativeQuadrotor3DWorld
            elif is_quadrotor_env(cfg.env):
                cls = NativeQuadrotorWorld
            else:
                cls = NativeCartPoleWorld if is_cartpole_env(cfg.env) else NativePendulumWorld
        else:
            from mppi_gpu_tpu.envs.mujoco_world import (
                MujocoArmWorld,
                MujocoCartPoleWorld,
                MujocoPendulumWorld,
                MujocoQuadrotor3DWorld,
                MujocoQuadrotorWorld,
            )

            if is_quadrotor3d_env(cfg.env):
                cls = MujocoQuadrotor3DWorld
            elif is_quadrotor_env(cfg.env):
                cls = MujocoQuadrotorWorld
            elif is_arm_env(cfg.env):
                cls = MujocoArmWorld
            else:
                cls = MujocoCartPoleWorld if is_cartpole_env(cfg.env) else MujocoPendulumWorld
        mw = cls(params)
        traj_world = np.empty((n_steps + 1, len(np.asarray(x0))), np.float32)
        traj_world[0] = mw.get_x()
        for t in range(n_steps):
            for _ in range(phys_steps):
                mw.step(us[t])
            traj_world[t + 1] = mw.get_x()
        xw_full = jnp.asarray(traj_world)
    else:
        if world_backend != "jax":
            raise ValueError(
                f"world backend {world_backend!r} not available for "
                f"'{cfg.env}' (use jax|native|mujoco)"
            )
        xw_full = None

    # the jitted jax-world rollout only runs when it IS the plant — the
    # native/mujoco backends already produced xw_full on the host
    @partial(_jax.jit, static_argnames="with_world")
    def rollouts(us, with_world):
        def mbody(x, u):
            x1 = dyn.step(x, u)
            return x1, x1

        _, xm = _jax.lax.scan(mbody, x0, us)
        xm = jnp.concatenate([x0[None], xm], axis=0)
        if not with_world:
            return xm, xm

        def wbody(ws, u):
            for _ in range(phys_steps):
                ws = world.physics_step(ws, u)
            return ws, ws.x

        _, xw = _jax.lax.scan(wbody, ws0, us)
        return xm, jnp.concatenate([x0[None], xw], axis=0)

    xm, xw = rollouts(jnp.asarray(us), with_world=xw_full is None)
    if xw_full is not None:
        xw = xw_full
    return MismatchResult(
        traj_model=np.asarray(xm), traj_world=np.asarray(xw), us=us,
        pos_dims=3 if is_quadrotor3d_env(cfg.env) else 0,
    )


def save_mismatch_csv(path: str, res: MismatchResult) -> None:
    """Side-by-side CSV like the reference's missmatch.csv
    (model_missmatch.cpp:102-121; `_s` = simulated model, `_w` = world).
    The [q, qd] families get q{i}/qd{i} columns; odd state layouts (the
    13-dim quaternion quadrotor) get generic x{i} columns, which
    scripts/plot_miss.py also understands."""
    s = res.traj_model.shape[1]
    if s % 2 == 0:
        a = s // 2
        names = [f"q{i}" for i in range(a)] + [f"qd{i}" for i in range(a)]
    else:
        names = [f"x{i}" for i in range(s)]
    with open(path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow([f"{n}_s" for n in names] + [f"{n}_w" for n in names])
        for xm, xw in zip(res.traj_model, res.traj_world):
            wr.writerow([f"{v:.8g}" for v in xm] + [f"{v:.8g}" for v in xw])


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mppi_gpu_tpu.miss")
    p.add_argument("-c", "--config", default=None, help="YAML config (for dims/dt)")
    p.add_argument("-a", "--axes", type=int, default=2, help="axes if no config")
    p.add_argument("-n", "--steps", type=int, default=100)
    p.add_argument("-o", "--out", default="missmatch.csv")
    p.add_argument("--world", choices=("jax", "native", "mujoco"), default="jax")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = load_config(args.config) if args.config else None
    if cfg is not None and any(
        fam in cfg.env for fam in ("pendulum", "cartpole", "quadrotor")
    ):
        # non-point-mass families: the jax world isolates the
        # integrator-level mismatch (same ODE, finer RK4); --world native
        # drives the C++ twin, --world mujoco the real engine
        res = run_mismatch_config(
            cfg, n_steps=args.steps, seed=args.seed, world_backend=args.world
        )
    else:
        n_axes, dt = (cfg.action_dim, cfg.dt) if cfg else (args.axes, 0.1)
        res = run_mismatch(
            n_axes, n_steps=args.steps, dt=dt, seed=args.seed,
            world_backend=args.world,
        )
    save_mismatch_csv(args.out, res)
    print(f"open-loop position RMSE (model vs world): {res.position_rmse:.4f} m")
    print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
