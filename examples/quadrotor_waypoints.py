#!/usr/bin/env python
"""Quadrotor waypoint tour: the planar birotor flies a sequence of
waypoints by re-targeting the hover cost mid-episode — the "moving goal"
pattern the pure-functional controller makes trivial (the goal is just a
cost parameter; no device state to rewrite, unlike the reference's
memcpy'd cost buffers, src/point_mass.cu:205-228). Produces a side-view
figure of the flight path, attitude ticks, and the waypoints.

Run:  python examples/quadrotor_waypoints.py [-o quadrotor_waypoints.png]
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
from mppi_gpu_tpu.ops.cost import QuadrotorHoverCost

WAYPOINTS = ((0.0, 1.0), (1.2, 0.4), (-0.3, 0.2))  # visit in order, then hover
REACH = 0.25          # waypoint is "reached" within this radius at low speed


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--out", default="quadrotor_waypoints.png")
    p.add_argument("--steps", type=int, default=600)
    args = p.parse_args(argv)

    cfg = load_config("configs/quadrotor.yaml")
    ctrl = MPPIController(cfg)
    world = make_jax_world(cfg, params_for_config(cfg))
    sim = jax.jit(world.simulate)

    ws = world.reset()
    U, key = ctrl.init_action_seq(), ctrl.init_key()
    xs, wp_idx, reached_at = [np.asarray(ws.x)], 0, []

    for step in range(args.steps):
        x = np.asarray(ws.x)
        wx, wz = WAYPOINTS[wp_idx]
        if (
            np.hypot(x[0] - wx, x[1] - wz) < REACH
            and np.hypot(x[3], x[4]) < 0.8
            and wp_idx not in {i for _, i in reached_at}  # first-reach events only
        ):
            reached_at.append((step, wp_idx))
            if wp_idx < len(WAYPOINTS) - 1:
                wp_idx += 1
                wx, wz = WAYPOINTS[wp_idx]
        # re-target: swap the goal in the (pure pytree) cost — nothing else
        # in the jitted solve changes, so no recompilation happens
        ctrl.cost = QuadrotorHoverCost(
            w=ctrl.cost.w, lambda_=ctrl.cost.lambda_, inv_s=ctrl.cost.inv_s,
            goal=jnp.asarray([wx, wz, 0.0, 0.0, 0.0, 0.0], jnp.float32),
        )
        res = ctrl.solve_auto(jnp.asarray(x), U, key, step)
        U = res.u_next
        ws, done = sim(ws, res.action)
        xs.append(np.asarray(ws.x))
        if done:
            break

    xs = np.asarray(xs)
    visited = {i for _, i in reached_at}
    final_wp = np.asarray(WAYPOINTS[-1])
    final_d = float(np.linalg.norm(xs[-1][:2] - final_wp))
    print(f"waypoints visited: {sorted(visited)} of {list(range(len(WAYPOINTS)))}")
    print(f"final distance to last waypoint: {final_d:.3f} m")
    print(f"max |tilt| over the flight: {np.abs(xs[:, 2]).max():.3f} rad")

    fig, ax = plt.subplots(figsize=(7, 5))
    ax.plot(xs[:, 0], xs[:, 1], "-", color="C0", lw=1.2, label="flight path")
    # attitude ticks: the body segment every ~0.5 s
    arm = 0.17
    for i in range(0, len(xs), 30):
        px, pz, th = xs[i, 0], xs[i, 1], xs[i, 2]
        dx, dz = arm * np.cos(th), -arm * np.sin(th)
        ax.plot([px - dx, px + dx], [pz - dz, pz + dz], "-", color="0.4", lw=2)
    ax.plot(*xs[0, :2], "o", color="C0", label="start")
    for j, (wx, wz) in enumerate(WAYPOINTS):
        ax.plot(wx, wz, "*", color="C2", ms=16)
        ax.annotate(f"wp{j}", (wx, wz), textcoords="offset points",
                    xytext=(6, 6), fontsize=9)
    ax.set_aspect("equal")
    ax.grid(alpha=0.3)
    ax.set(xlabel="x (m)", ylabel="z (m)",
           title="Planar quadrotor flying a waypoint tour (MPPI, mixer space)")
    ax.legend(loc="best", fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"saved {args.out}")
    return 0 if len(visited) == len(WAYPOINTS) and final_d < 0.4 else 1


if __name__ == "__main__":
    sys.exit(main())
