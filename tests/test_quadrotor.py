"""Planar-quadrotor family (fourth model family): mixer action space
(collective F, differential D), a nonzero nominal action (hover), and an
asymmetric per-rotor envelope [0, f_max] applied by the worlds after the
mix. The reference's models are all per-axis decoupled; pluggable model
families are its roadmap (reference README TODO + src/controller_base.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.envs import make_jax_world, params_for_config
from mppi_gpu_tpu.envs.quadrotor_world import QuadrotorParams, QuadrotorWorld
from mppi_gpu_tpu.models import dynamics_for_config
from mppi_gpu_tpu.models.quadrotor import QuadrotorDynamics
from mppi_gpu_tpu.runner import run_closed_loop

CFG = "configs/quadrotor.yaml"


def test_dispatch():
    cfg = load_config(CFG)
    assert isinstance(dynamics_for_config(cfg), QuadrotorDynamics)
    assert isinstance(params_for_config(cfg), QuadrotorParams)
    assert isinstance(make_jax_world(cfg), QuadrotorWorld)


def test_dynamics_physics():
    dyn = QuadrotorDynamics.create(0.01)
    hover = float(dyn.mass * dyn.gravity)
    # hover collective, zero differential: level flight, no acceleration
    x = jnp.zeros((6,))
    for _ in range(50):
        x = dyn.step(x, jnp.array([hover, 0.0]))
    np.testing.assert_allclose(np.asarray(x), np.zeros(6), atol=1e-5)
    # zero thrust: free fall, z̈ = −g
    x1 = dyn.step(jnp.zeros((6,)), jnp.zeros((2,)))
    assert float(x1[4]) == pytest.approx(-9.81 * 0.01, rel=1e-5)
    # positive differential (extra LEFT thrust) tips the right side down
    # (θ̈ > 0) and, once tilted, the thrust vector leans toward +x
    x = jnp.zeros((6,))
    for _ in range(30):
        x = dyn.step(x, jnp.array([hover, 1.0]))
    assert float(x[2]) > 0.01, "theta should go positive (right tip down)"
    assert float(x[3]) > 0.0, "tilted thrust should accelerate +x"


def test_world_matches_model_open_loop():
    """Same ODE, coarse RK2 (model) vs fine RK4 (world): near-hover inputs
    keep the gap at integration level."""
    cfg = load_config(CFG)
    dyn = dynamics_for_config(cfg)
    world = make_jax_world(cfg)
    ws = world.reset()
    x = jnp.asarray(ws.x)
    u = jnp.array([7.85, 0.05])  # slightly off hover: tilts + drifts
    phys_per_model = round(cfg.dt / world.params.timestep)
    for _ in range(20):
        x = dyn.step(x, u)
        for _ in range(phys_per_model):
            ws = world.physics_step(ws, u)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ws.x), atol=0.05)


def test_world_thrust_clamp():
    """The plant mixes (F, D) → rotors and clamps each to [0, f_max]; the
    model doesn't (the deliberate model-plant gap). Negative collective =
    free fall; saturated differential loses torque authority."""
    p = QuadrotorParams()
    w = QuadrotorWorld(p)
    ws = w.reset()
    for _ in range(10):
        ws = w.physics_step(ws, jnp.array([-10.0, 0.0]))
    # rotors clamped to zero: pure free fall, no tilt
    assert float(ws.vz) < 0.0
    assert float(ws.th) == 0.0
    ws2 = w.reset()
    for _ in range(10):
        ws2 = w.physics_step(ws2, jnp.array([100.0, 0.0]))
    # clamped to 2*f_max total: bounded upward acceleration
    t = 10 * p.timestep
    max_vz = (2 * p.max_thrust / p.mass - p.gravity) * t
    assert 0.0 < float(ws2.vz) <= max_vz + 1e-5
    # differential beyond the envelope: f_l clamps at f_max, f_r at 0 — the
    # realized torque is r·f_max, not r·D
    ws3 = w.reset()
    ws3 = w.physics_step(ws3, jnp.array([2 * p.max_thrust, 10 * p.max_thrust]))
    om_cap = p.arm * p.max_thrust / p.inertia * p.timestep
    assert 0.0 < float(ws3.om) <= om_cap + 1e-5


@pytest.mark.slow
def test_waypoint_flight():
    """The controller must fly from (−1, 0) to the (1, 0.5) waypoint and
    hover there — nonzero nominal action, coupled actuation."""
    cfg = load_config(CFG)
    res = run_closed_loop(MPPIController(cfg), max_steps=360)
    goal = np.asarray(cfg.goal[:2])
    final = res.xs[-1][:2]
    assert np.linalg.norm(final - goal) < 0.3, f"missed waypoint: {final}"
    # settled: small velocity and near-level attitude at the end
    tail = res.xs[-30:]
    assert np.abs(tail[:, 3:5]).max() < 1.0, "not settled (velocity)"
    assert np.abs(tail[:, 2]).max() < 0.5, "not settled (attitude)"


def test_native_matches_jax_world():
    from mppi_gpu_tpu.envs.native import NativeQuadrotorWorld, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    params = QuadrotorParams()
    njax, nat = QuadrotorWorld(params), NativeQuadrotorWorld(params)
    ws = njax.reset()
    sim = jax.jit(njax.simulate)
    rng = np.random.default_rng(0)
    hover = params.mass * params.gravity
    for i in range(40):
        u = np.array(
            [hover + rng.uniform(-1.5, 1.5), rng.uniform(-0.4, 0.4)], np.float32
        )
        ws, _ = sim(ws, jnp.asarray(u))
        nat.simulate(u)
        np.testing.assert_allclose(
            np.asarray(ws.x), nat.get_x(), rtol=2e-4, atol=2e-5,
            err_msg=f"diverged at cycle {i}",
        )


def test_native_checkpoint_restore():
    from mppi_gpu_tpu.envs.native import NativeQuadrotorWorld, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    p = QuadrotorParams()
    w = NativeQuadrotorWorld(p)
    for _ in range(5):
        w.simulate(np.array([7.9, 0.2], np.float32))
    x, t = w.get_x(), w.time
    w2 = NativeQuadrotorWorld(p)
    w2.set_state(x, t)
    w.simulate(np.array([7.7, -0.3], np.float32))
    w2.simulate(np.array([7.7, -0.3], np.float32))
    np.testing.assert_allclose(w.get_x(), w2.get_x(), atol=1e-6)


def test_mismatch_harness():
    from mppi_gpu_tpu.miss import run_mismatch_config

    cfg = load_config(CFG)
    res = run_mismatch_config(cfg, n_steps=30)
    assert res.traj_model.shape == (31, 6)
    assert res.traj_world.shape == (31, 6)
    # hover-centered excitation keeps the open loop bounded; the integration
    # gap (coarse RK2 vs fine RK4 + thrust clamp) is the measured mismatch
    assert 0.0 < res.position_rmse < 5.0
