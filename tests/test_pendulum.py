"""Pendulum family: nonlinear dynamics, trig swing-up cost, second world —
exercises every extension seam at once (model registry, cost registry, env
dispatch, runner, checkpointing API surface)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.envs import make_jax_world, params_for_config
from mppi_gpu_tpu.envs.pendulum_world import PendulumParams, PendulumWorld
from mppi_gpu_tpu.models import dynamics_for_config
from mppi_gpu_tpu.models.pendulum import PendulumDynamics
from mppi_gpu_tpu.runner import run_closed_loop

CFG = "configs/pendulum.yaml"


def test_dispatch_selects_pendulum():
    cfg = load_config(CFG)
    assert isinstance(dynamics_for_config(cfg), PendulumDynamics)
    assert isinstance(params_for_config(cfg), PendulumParams)
    assert isinstance(make_jax_world(cfg), PendulumWorld)
    # point-mass configs unaffected
    cfg_pm = load_config("configs/point_mass2d.yaml")
    assert not isinstance(dynamics_for_config(cfg_pm), PendulumDynamics)


def test_dynamics_physics():
    dyn = PendulumDynamics.create(0.01, damping=0.0)
    # unstable equilibrium: tiny perturbation grows
    x = jnp.array([1e-3, 0.0])
    for _ in range(200):
        x = dyn.step(x, jnp.zeros((1,)))
    assert float(jnp.abs(x[0])) > 1e-2
    # hanging down is stable: stays at pi
    x = jnp.array([jnp.pi, 0.0])
    x2 = dyn.step(x, jnp.zeros((1,)))
    np.testing.assert_allclose(float(x2[0]), np.pi, rtol=1e-5)
    # energy decays with damping, torque-free
    dyn_d = PendulumDynamics.create(0.01, damping=0.5)

    def energy(x):
        th, thd = float(x[0]), float(x[1])
        return 0.5 * thd**2 + 9.81 * (np.cos(th) - (-1.0))  # min at th=pi

    x = jnp.array([2.0, 0.0])
    e0 = energy(x)
    for _ in range(300):
        x = dyn_d.step(x, jnp.zeros((1,)))
    assert energy(x) < e0


def test_world_matches_model_open_loop():
    """Same ODE, different integrators: short open-loop trajectories must
    agree closely (the gap is the deliberate model-plant mismatch)."""
    cfg = load_config(CFG)
    dyn = dynamics_for_config(cfg)
    world = make_jax_world(cfg)
    ws = world.reset()
    x = jnp.asarray(ws.x)
    u = jnp.array([0.8])
    phys_per_model = round(cfg.dt / world.params.timestep)
    for _ in range(20):  # 1 s of sim time
        x = dyn.step(x, u)
        for _ in range(phys_per_model):
            ws = world.physics_step(ws, u)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ws.x), atol=0.05)


def test_native_matches_jax_world():
    """The C++ and JAX pendulum worlds implement identical physics; open-loop
    trajectories must agree to float32 tolerance."""
    from mppi_gpu_tpu.envs.native import NativePendulumWorld, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    cfg = load_config(CFG)
    params = params_for_config(cfg)
    njax = make_jax_world(cfg, params)
    nat = NativePendulumWorld(params)
    ws = njax.reset()
    sim = jax.jit(njax.simulate)
    rng = np.random.default_rng(0)
    for i in range(40):
        u = rng.uniform(-2, 2, size=(1,)).astype(np.float32)
        ws, _ = sim(ws, jnp.asarray(u))
        nat.simulate(u)
        np.testing.assert_allclose(
            np.asarray(ws.x), nat.get_x(), rtol=1e-4, atol=1e-5,
            err_msg=f"diverged at cycle {i}",
        )


def test_native_closed_loop_runs():
    from mppi_gpu_tpu.envs.native import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    cfg = load_config(CFG).replace(samples=128, horizon=20)
    res = run_closed_loop(MPPIController(cfg), world_backend="native", max_steps=10)
    assert len(res.us) == 10
    assert np.all(np.isfinite(res.xs))


def test_swing_up():
    """From hanging down with max torque < m·g·l, the controller must pump
    energy over several swings and end balanced upright."""
    cfg = load_config(CFG)
    res = run_closed_loop(MPPIController(cfg), max_steps=520)
    th = np.angle(np.exp(1j * res.xs[:, 0]))  # wrap to [-pi, pi]
    assert np.abs(th[:20]).min() > 2.0, "starts hanging down"
    # the exact swing count is chaotic (fp reassociation shifts it between
    # compilers/devices), so assert the OUTCOME: balanced by the end
    assert np.abs(th[-30:]).max() < 0.6, (
        f"not balanced upright at the end: |theta| last 30 max {np.abs(th[-30:]).max():.3f}"
    )
    assert np.abs(res.xs[-1, 1]) < 1.5  # low angular velocity
