"""Obstacle cost: the registry's second real cost type. An obstacle placed on
the straight line to the goal must (a) dominate the cost of rollouts passing
through it, and (b) steer the closed-loop trajectory around it."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.ops.cost import make_cost
from mppi_gpu_tpu.runner import run_closed_loop


def _cfg(**kw):
    base = dict(
        cost_type="obstacle",
        obstacles=((0.25, 0.25, 0.15),),  # sphere on the straight path to (0.5, 0.5)
        obstacle_w=500.0,
    )
    base.update(kw)
    return load_config("configs/point_mass2d.yaml").replace(**base)


def test_obstacle_cost_values():
    cost = make_cost(_cfg())
    u = jnp.zeros((2,))
    inside = jnp.array([0.25, 0.25, 0.0, 0.0])   # at the obstacle center
    outside = jnp.array([0.0, 0.0, 0.0, 0.0])
    assert float(cost.step(inside, u, u)) > float(cost.step(outside, u, u)) + 400.0
    assert float(cost.final(inside)) > float(cost.final(outside)) + 400.0


def test_obstacle_requires_entries():
    with pytest.raises(ValueError, match="cost.obstacles"):
        make_cost(load_config("configs/point_mass2d.yaml").replace(cost_type="obstacle"))
    with pytest.raises(ValueError, match="center coords"):
        make_cost(_cfg(obstacles=((0.2, 0.1),)))


def test_closed_loop_avoids_obstacle():
    cfg = _cfg(samples=512, horizon=30)
    res = run_closed_loop(MPPIController(cfg), max_steps=150)
    q = res.xs[:, :2]
    d = np.linalg.norm(q - np.array([0.25, 0.25]), axis=1)
    # never enters the obstacle...
    assert d.min() > 0.15, f"trajectory entered the obstacle (min clearance {d.min():.3f})"
    # ...while still making progress toward the goal
    goal_d = np.linalg.norm(q - np.array([0.5, 0.5]), axis=1)
    assert goal_d[-1] < goal_d[0]


def test_yaml_obstacle_roundtrip(tmp_path):
    src = open("configs/point_mass2d.yaml").read()
    src = src.replace(
        "cost:", "cost:\n  obstacles:\n    - [0.3, 0.2, 0.1]\n  obstacle-w: 250.0"
    )
    p = tmp_path / "obs.yaml"
    p.write_text(src.replace("type: quadratic", "type: obstacle"))
    cfg = load_config(p)
    assert cfg.cost_type == "obstacle"
    assert cfg.obstacles == ((0.3, 0.2, 0.1),)
    assert cfg.obstacle_w == 250.0
    make_cost(cfg)  # builds
