"""Batched multi-robot controller: each robot's solve must equal the
single-robot solve with the same key, and per-robot goals must steer each
robot toward its own target."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mppi_gpu_tpu.batched import BatchedMPPIController
from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController

CFG = "configs/mppi-config-test.yaml"


def test_batched_matches_single():
    cfg = load_config(CFG)
    B = 3
    ctrl_b = BatchedMPPIController(cfg, B)
    ctrl_1 = MPPIController(cfg, rollout_backend="scan")

    xs = jnp.stack([jnp.full((cfg.state_dim,), 0.1 * i) for i in range(B)])
    Us = ctrl_b.init_action_seqs()
    keys = ctrl_b.init_keys()
    res_b = ctrl_b.solve_batch(xs, Us, keys)
    assert res_b.action.shape == (B, cfg.action_dim)
    assert res_b.info.costs.shape == (B, cfg.samples)

    for i in range(B):
        res_1 = ctrl_1.solve(xs[i], Us[i], keys[i])
        np.testing.assert_allclose(
            np.asarray(res_b.action[i]), np.asarray(res_1.action), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(res_b.u_next[i]), np.asarray(res_1.u_next), rtol=1e-5, atol=1e-6
        )


def test_per_robot_goals_steer_apart():
    cfg = load_config("configs/point_mass1d.yaml").replace(samples=256, horizon=20)
    B = 2
    goals = jnp.asarray([[1.0, 0.0], [-1.0, 0.0]])
    ctrl = BatchedMPPIController(cfg, B, goals=goals)
    xs = jnp.zeros((B, cfg.state_dim))
    res = ctrl.solve_batch(xs, ctrl.init_action_seqs(), ctrl.init_keys())
    # robot 0 pushes toward +1, robot 1 toward −1
    assert float(res.action[0, 0]) > 0.05
    assert float(res.action[1, 0]) < -0.05
