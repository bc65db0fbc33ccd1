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

    @property
    def position_rmse(self) -> float:
        a = self.us.shape[1]
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
    if world_backend == "native":
        from mppi_gpu_tpu.envs.native import NativePointMassWorld

        world = NativePointMassWorld(params)
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


def save_mismatch_csv(path: str, res: MismatchResult) -> None:
    """Side-by-side CSV like the reference's missmatch.csv
    (model_missmatch.cpp:102-121; `_s` = simulated model, `_w` = world)."""
    s = res.traj_model.shape[1]
    a = s // 2
    names = [f"q{i}" for i in range(a)] + [f"qd{i}" for i in range(a)]
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
    p.add_argument("--world", choices=("jax", "native"), default="jax")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.config:
        cfg = load_config(args.config)
        n_axes, dt = cfg.action_dim, cfg.dt
    else:
        n_axes, dt = args.axes, 0.1

    res = run_mismatch(
        n_axes, n_steps=args.steps, dt=dt, seed=args.seed, world_backend=args.world
    )
    save_mismatch_csv(args.out, res)
    print(f"open-loop position RMSE (model vs world): {res.position_rmse:.4f} m")
    print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
