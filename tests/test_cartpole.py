"""Cart-pole family: the first COUPLED nonlinear dynamics (cart and pole
exchange momentum), balance cost, third world."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.envs import make_jax_world, params_for_config
from mppi_gpu_tpu.envs.cartpole_world import CartPoleParams, CartPoleWorld
from mppi_gpu_tpu.models import dynamics_for_config
from mppi_gpu_tpu.models.cartpole import CartPoleDynamics
from mppi_gpu_tpu.runner import run_closed_loop

CFG = "configs/cartpole.yaml"


def test_dispatch():
    cfg = load_config(CFG)
    assert isinstance(dynamics_for_config(cfg), CartPoleDynamics)
    assert isinstance(params_for_config(cfg), CartPoleParams)
    assert isinstance(make_jax_world(cfg), CartPoleWorld)


def test_dynamics_physics():
    dyn = CartPoleDynamics.create(0.005)
    # uncontrolled pole falls from a small tilt
    x = jnp.array([0.0, 0.05, 0.0, 0.0])
    for _ in range(400):
        x = dyn.step(x, jnp.zeros((1,)))
    assert abs(float(x[1])) > 0.5, "pole should fall without control"
    # pushing the cart right accelerates it right and tips the pole backwards
    x1 = CartPoleDynamics.create(0.02).step(
        jnp.array([0.0, 0.0, 0.0, 0.0]), jnp.array([5.0])
    )
    assert float(x1[2]) > 0          # cart moves right
    assert float(x1[3]) < 0          # pole tips backward (negative theta rate)


def test_world_matches_model_open_loop():
    cfg = load_config(CFG)
    dyn = dynamics_for_config(cfg)
    world = make_jax_world(cfg)
    ws = world.reset()
    x = jnp.asarray(ws.x)
    u = jnp.array([1.5])
    phys_per_model = round(cfg.dt / world.params.timestep)
    for _ in range(20):
        x = dyn.step(x, u)
        for _ in range(phys_per_model):
            ws = world.physics_step(ws, u)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ws.x), atol=0.08)


def test_balance():
    """From a 0.15 rad tilt, the controller must catch the pole and keep it
    upright near the track center for the whole run."""
    cfg = load_config(CFG)
    res = run_closed_loop(MPPIController(cfg), max_steps=300)
    th = res.xs[:, 1]
    p = res.xs[:, 0]
    assert np.abs(th).max() < 0.6, f"pole fell: max |theta| {np.abs(th).max():.2f}"
    assert np.abs(th[-50:]).max() < 0.2, "not stabilized upright at the end"
    assert np.abs(p).max() < 2.0, "cart ran toward the track limit"


def test_native_matches_jax_world():
    from mppi_gpu_tpu.envs.native import NativeCartPoleWorld, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    params = CartPoleParams()
    njax, nat = CartPoleWorld(params), NativeCartPoleWorld(params)
    ws = njax.reset()
    sim = jax.jit(njax.simulate)
    rng = np.random.default_rng(0)
    for i in range(40):
        u = rng.uniform(-8, 8, size=(1,)).astype(np.float32)
        ws, _ = sim(ws, jnp.asarray(u))
        nat.simulate(u)
        np.testing.assert_allclose(
            np.asarray(ws.x), nat.get_x(), rtol=2e-4, atol=2e-5,
            err_msg=f"diverged at cycle {i}",
        )


def test_native_balance_runs():
    from mppi_gpu_tpu.envs.native import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    cfg = load_config(CFG).replace(samples=256, horizon=25)
    res = run_closed_loop(MPPIController(cfg), world_backend="native", max_steps=60)
    assert np.abs(res.xs[:, 1]).max() < 0.6  # pole stays up
