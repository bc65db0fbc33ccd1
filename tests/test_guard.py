"""Failure detection: a diverging solve must raise ControllerDiverged with
step + diagnostics, instead of silently feeding NaN actions to the world."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.ops.cost import QuadraticCost
from mppi_gpu_tpu.runner import run_closed_loop
from mppi_gpu_tpu.utils.guard import ControllerDiverged, check_solve

CFG = "configs/mppi-config-test.yaml"


def _diverging_controller():
    """Infinite cost weights → every rollout cost is +inf → β−S = inf−inf =
    NaN weights → NaN action. The guard must catch it at step 0."""
    cfg = load_config(CFG)
    bad_cost = QuadraticCost(
        w=jnp.full((cfg.state_dim,), jnp.inf),
        goal=jnp.asarray(cfg.goal, jnp.float32),
        lambda_=jnp.float32(cfg.lambda_),
        inv_s=jnp.ones((cfg.action_dim,)),
    )
    return MPPIController(cfg, cost=bad_cost)


def test_diverging_solve_raises():
    with pytest.raises(ControllerDiverged) as ei:
        run_closed_loop(_diverging_controller(), max_steps=3)
    assert ei.value.step == 0
    assert "non-finite rollout costs" in str(ei.value)


def test_validate_false_does_not_raise():
    res = run_closed_loop(_diverging_controller(), max_steps=2, validate=False)
    assert not np.all(np.isfinite(res.us))


def test_check_solve_passes_finite():
    check_solve(5, np.array([0.1, -0.2]), None)
