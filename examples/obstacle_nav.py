#!/usr/bin/env python
"""Obstacle navigation demo: the 2-D point mass must reach its goal past
spherical no-go zones placed on the direct path (cost.type 'obstacle').
Produces a top-down figure of the closed-loop path, the obstacles, and the
goal.

Run:  python examples/obstacle_nav.py [-o obstacle_nav.png]
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

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.runner import run_closed_loop

OBSTACLES = ((0.45, 0.12, 0.18), (0.75, -0.18, 0.15))  # (cx, cy, r) on the way to (1, 0)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--out", default="obstacle_nav.png")
    p.add_argument("--steps", type=int, default=500)
    args = p.parse_args(argv)

    cfg = load_config("configs/point_mass2d.yaml").replace(
        cost_type="obstacle", obstacles=OBSTACLES, obstacle_w=800.0,
        noise_beta=0.5,  # smoother exploration navigates gaps better
    )
    res = run_closed_loop(MPPIController(cfg), max_steps=args.steps)
    q = res.xs[:, :2]

    clear = min(
        float(np.min(np.linalg.norm(q - np.array(o[:2]), axis=1)) - o[2])
        for o in OBSTACLES
    )
    goal_d = float(np.linalg.norm(q[-1] - np.array(cfg.goal[:2])))
    print(f"min clearance beyond obstacle radii: {clear:+.3f} m")
    print(f"final distance to goal: {goal_d:.3f} m")

    fig, ax = plt.subplots(figsize=(7, 5))
    for cx, cy, r in OBSTACLES:
        ax.add_patch(plt.Circle((cx, cy), r, color="C3", alpha=0.35))
        ax.add_patch(plt.Circle((cx, cy), r, fill=False, color="C3", lw=1.5))
    ax.plot(q[:, 0], q[:, 1], "-", color="C0", lw=1.5, label="closed-loop path")
    ax.plot(*q[0], "o", color="C0", label="start")
    ax.plot(cfg.goal[0], cfg.goal[1], "*", color="C2", ms=16, label="goal")
    ax.set_aspect("equal")
    ax.grid(alpha=0.3)
    ax.legend(loc="best", fontsize=8)
    ax.set_title("MPPI navigating spherical no-go zones")
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"saved {args.out}")
    return 0 if clear > 0 and goal_d < 0.8 else 1


if __name__ == "__main__":
    sys.exit(main())
