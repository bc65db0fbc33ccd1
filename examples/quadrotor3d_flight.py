#!/usr/bin/env python
"""3-D quadrotor waypoint flight: the quaternion SE(3) model flies a
three-waypoint tour through space by re-targeting the hover cost
mid-episode — the same moving-goal pattern as the planar example
(examples/quadrotor_waypoints.py), now with the full 13-state rigid body
and the 4-rotor mixer. Produces a 3-D figure of the flight path with
attitude crosses (body axes drawn from the quaternion) at regular
intervals.

Run:  python examples/quadrotor3d_flight.py [-o quadrotor3d_flight.png]
"""

from __future__ import annotations

import argparse
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.envs import make_jax_world, params_for_config
from mppi_gpu_tpu.ops.cost import Quadrotor3DHoverCost

WAYPOINTS = ((-0.2, 0.1, 1.3), (0.8, 0.6, 0.8), (0.0, 0.4, 0.5))
REACH = 0.3           # waypoint is "reached" within this radius at low speed


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--out", default="quadrotor3d_flight.png")
    p.add_argument("--steps", type=int, default=600)
    args = p.parse_args(argv)

    cfg = load_config("configs/quadrotor3d.yaml")
    ctrl = MPPIController(cfg)
    # tour tuning: the config's velocity weights are hover-conservative;
    # lighten them so the legs transit at ~0.5 m/s instead of crawling
    ctrl.cost = Quadrotor3DHoverCost(
        w=jnp.asarray([4.0, 4.0, 4.0, 10.0, 1.2, 1.2, 1.2, 0.5], jnp.float32),
        goal=ctrl.cost.goal, lambda_=ctrl.cost.lambda_, inv_s=ctrl.cost.inv_s,
    )
    world = make_jax_world(cfg, params_for_config(cfg))
    sim = jax.jit(world.simulate)

    ws = world.reset()
    U, key = ctrl.init_action_seq(), ctrl.init_key()
    xs, wp_idx, reached_at = [np.asarray(ws.x)], 0, []

    for step in range(args.steps):
        x = np.asarray(ws.x)
        wp = WAYPOINTS[wp_idx]
        if (
            np.linalg.norm(x[0:3] - wp) < REACH
            and np.linalg.norm(x[7:10]) < 0.8
            and wp_idx not in {i for _, i in reached_at}  # first-reach only
        ):
            reached_at.append((step, wp_idx))
            if wp_idx < len(WAYPOINTS) - 1:
                wp_idx += 1
                wp = WAYPOINTS[wp_idx]
        # re-target: swap the goal in the (pure pytree) cost — nothing else
        # in the jitted solve changes, so no recompilation happens
        goal = jnp.zeros(13, jnp.float32).at[0:3].set(jnp.asarray(wp))
        ctrl.cost = Quadrotor3DHoverCost(
            w=ctrl.cost.w, lambda_=ctrl.cost.lambda_, inv_s=ctrl.cost.inv_s,
            goal=goal,
        )
        res = ctrl.solve_auto(jnp.asarray(x), U, key, step)
        U = res.u_next
        ws, done = sim(ws, res.action)
        xs.append(np.asarray(ws.x))
        if done:
            break

    xs = np.asarray(xs)
    visited = {i for _, i in reached_at}
    final_d = float(np.linalg.norm(xs[-1][0:3] - WAYPOINTS[-1]))
    tilt = 2.0 * (xs[:, 4] ** 2 + xs[:, 5] ** 2)
    print(f"waypoints visited: {sorted(visited)} of {list(range(len(WAYPOINTS)))}")
    print(f"final distance to last waypoint: {final_d:.3f} m")
    print(f"max tilt (1 - e_z . R e_z) over the flight: {tilt.max():.3f}")

    fig = plt.figure(figsize=(7.5, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.plot(xs[:, 0], xs[:, 1], xs[:, 2], "-", color="C0", lw=1.2,
            label="flight path")
    # attitude crosses from the quaternion every ~0.5 s
    from mppi_gpu_tpu.envs.quadrotor3d_world import quat_to_body_axes

    arm = 0.17
    for i in range(0, len(xs), 30):
        pxyz = xs[i, 0:3]
        for b in quat_to_body_axes(xs[i, 3:7], arm):
            ax.plot(*[[pxyz[d] - b[d], pxyz[d] + b[d]] for d in range(3)],
                    "-", color="0.4", lw=1.8)
    ax.plot([xs[0, 0]], [xs[0, 1]], [xs[0, 2]], "o", color="C0", label="start")
    for j, wp in enumerate(WAYPOINTS):
        ax.plot([wp[0]], [wp[1]], [wp[2]], "*", color="C2", ms=14)
        ax.text(wp[0], wp[1], wp[2] + 0.06, f"wp{j}", fontsize=9)
    ax.set(xlabel="x (m)", ylabel="y (m)", zlabel="z (m)",
           title="3-D quadrotor waypoint tour (MPPI, quaternion SE(3))")
    ax.legend(loc="best", fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"saved {args.out}")
    return 0 if len(visited) == len(WAYPOINTS) and final_d < 0.45 else 1


if __name__ == "__main__":
    sys.exit(main())
