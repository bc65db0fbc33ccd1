"""Full 3-D quadrotor family (fifth model family): quaternion SE(3) rigid
body, A=4 mixer action space [F, τx, τy, τz], four-rotor "+" configuration
with per-rotor [0, f_max] envelopes in the worlds. Exercises the extension
seams at the largest state dim in the framework (13) and validates the
quaternion dynamics against the real MuJoCo engine (freejoint plant)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.envs import make_jax_world, params_for_config
from mppi_gpu_tpu.envs.quadrotor3d_world import (
    Quadrotor3DParams,
    Quadrotor3DWorld,
    mix_to_rotors,
    rotors_to_wrench,
)
from mppi_gpu_tpu.models import dynamics_for_config
from mppi_gpu_tpu.models.quadrotor3d import Quadrotor3DDynamics
from mppi_gpu_tpu.runner import run_closed_loop

CFG = "configs/quadrotor3d.yaml"


def test_dispatch():
    cfg = load_config(CFG)
    assert isinstance(dynamics_for_config(cfg), Quadrotor3DDynamics)
    assert isinstance(params_for_config(cfg), Quadrotor3DParams)
    assert isinstance(make_jax_world(cfg), Quadrotor3DWorld)
    # the PLANAR family is not shadowed by the 3d one
    from mppi_gpu_tpu.envs import is_quadrotor3d_env, is_quadrotor_env

    assert is_quadrotor3d_env("quadrotor3d") and not is_quadrotor_env("quadrotor3d")
    assert is_quadrotor_env("quadrotor") and not is_quadrotor3d_env("quadrotor")
    from mppi_gpu_tpu.models.quadrotor import QuadrotorDynamics

    cfg_pl = load_config("configs/quadrotor.yaml")
    assert type(dynamics_for_config(cfg_pl)) is QuadrotorDynamics


def test_mixer_roundtrip():
    """rotors_to_wrench inverts mix_to_rotors exactly (pre-clamp)."""
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)
    f = mix_to_rotors(u, arm=0.17, kappa=0.016)
    u_back = rotors_to_wrench(f, arm=0.17, kappa=0.016)
    np.testing.assert_allclose(np.asarray(u_back), np.asarray(u), rtol=1e-4, atol=1e-5)


def test_dynamics_physics():
    dyn = Quadrotor3DDynamics.create(0.01)
    hover = float(dyn.mass * dyn.gravity)
    iq = jnp.zeros(13).at[3].set(1.0)  # identity quaternion, at rest
    # hover: exactly stationary
    x = iq
    for _ in range(100):
        x = dyn.step(x, jnp.array([hover, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(x), np.asarray(iq), atol=1e-5)
    # zero thrust: free fall, z̈ = −g
    x1 = dyn.step(iq, jnp.zeros(4))
    assert float(x1[9]) == pytest.approx(-9.81 * 0.01, rel=1e-5)
    # +τx (roll right-hand about +x): qx grows, thrust leans toward −y
    x = iq
    for _ in range(30):
        x = dyn.step(x, jnp.array([hover, 0.02, 0.0, 0.0]))
    assert float(x[4]) > 0.01, "qx should go positive under +roll torque"
    assert float(x[8]) < 0.0, "rolled thrust should accelerate −y"
    # +τy (pitch about +y): qy grows, thrust leans toward +x
    x = iq
    for _ in range(30):
        x = dyn.step(x, jnp.array([hover, 0.0, 0.02, 0.0]))
    assert float(x[5]) > 0.01 and float(x[7]) > 0.0
    # +τz: pure yaw — qz grows, no translation
    x = iq
    for _ in range(30):
        x = dyn.step(x, jnp.array([hover, 0.0, 0.0, 0.01]))
    assert float(x[6]) > 0.005
    np.testing.assert_allclose(np.asarray(x[0:3]), np.zeros(3), atol=1e-5)
    # quaternion stays unit through aggressive tumbling
    x = iq
    for _ in range(200):
        x = dyn.step(x, jnp.array([hover, 0.03, -0.02, 0.01]))
    assert float(jnp.sum(x[3:7] ** 2)) == pytest.approx(1.0, abs=1e-5)


def test_world_matches_model_open_loop():
    """Same ODE, coarse RK2 (model) vs fine RK4 (world): near-hover inputs
    keep the gap at integration level."""
    cfg = load_config(CFG)
    dyn = dynamics_for_config(cfg)
    world = make_jax_world(cfg)
    ws = world.reset()
    x = jnp.asarray(ws.x)
    u = jnp.array([7.85, 0.01, 0.015, 0.002])  # slightly off hover
    phys_per_model = round(cfg.dt / world.params.timestep)
    for _ in range(20):
        x = dyn.step(x, u)
        for _ in range(phys_per_model):
            ws = world.physics_step(ws, u)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ws.x), atol=0.05)


def test_world_rotor_clamp():
    """The plant mixes the wrench to rotors and clamps each to [0, f_max];
    saturation redistributes the achieved wrench (the yaw channel has gain
    1/(4κ) ≈ 15.6 N per N·m — the clamp turns excess yaw into collective,
    which is why the config's τ envelopes are tight)."""
    p = Quadrotor3DParams()
    w = Quadrotor3DWorld(p)
    ws = w.reset()
    for _ in range(10):
        ws = w.physics_step(ws, jnp.array([-10.0, 0.0, 0.0, 0.0]))
    # rotors clamped to zero: pure free fall, level
    assert float(ws.v[2]) < 0.0
    np.testing.assert_allclose(np.asarray(ws.q), [1, 0, 0, 0], atol=1e-6)
    # an over-envelope yaw command saturates two rotors at 0 and leaves the
    # OTHER two carrying thrust: achieved collective exceeds the command
    f = jnp.clip(
        mix_to_rotors(jnp.array([4.0, 0.0, 0.0, 0.5]), p.arm, p.kappa),
        0.0, p.max_thrust,
    )
    achieved = rotors_to_wrench(f, p.arm, p.kappa)
    assert float(achieved[0]) > 4.0 + 1.0
    assert float(achieved[3]) < 0.5


@pytest.mark.slow
def test_waypoint_flight():
    """The controller must fly from (−1, 0, 0.5) to (1, 0.5, 1) and hover —
    the full SE(3) control problem through the standard closed loop."""
    cfg = load_config(CFG)
    res = run_closed_loop(MPPIController(cfg), max_steps=400)
    goal = np.asarray(cfg.goal[:3])
    final = res.xs[-1][:3]
    assert np.linalg.norm(final - goal) < 0.35, f"missed waypoint: {final}"
    tail = res.xs[-30:]
    assert np.abs(tail[:, 7:10]).max() < 1.0, "not settled (velocity)"
    # near-level: tilt = 2(qx²+qy²) small
    tilt = 2.0 * (tail[:, 4] ** 2 + tail[:, 5] ** 2)
    assert tilt.max() < 0.1, "not settled (attitude)"


def test_native_matches_jax_world():
    from mppi_gpu_tpu.envs.native import NativeQuadrotor3DWorld, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    params = Quadrotor3DParams()
    njax, nat = Quadrotor3DWorld(params), NativeQuadrotor3DWorld(params)
    ws = njax.reset()
    sim = jax.jit(njax.simulate)
    rng = np.random.default_rng(0)
    hover = params.mass * params.gravity
    for i in range(40):
        u = np.array(
            [
                hover + rng.uniform(-1.5, 1.5),
                rng.uniform(-0.05, 0.05),
                rng.uniform(-0.05, 0.05),
                rng.uniform(-0.01, 0.01),
            ],
            np.float32,
        )
        ws, _ = sim(ws, jnp.asarray(u))
        nat.simulate(u)
        np.testing.assert_allclose(
            np.asarray(ws.x), nat.get_x(), rtol=2e-4, atol=2e-5,
            err_msg=f"diverged at cycle {i}",
        )


def test_native_checkpoint_restore():
    from mppi_gpu_tpu.envs.native import NativeQuadrotor3DWorld, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    p = Quadrotor3DParams()
    w = NativeQuadrotor3DWorld(p)
    for _ in range(5):
        w.simulate(np.array([7.9, 0.02, -0.01, 0.002], np.float32))
    x, t = w.get_x(), w.time
    w2 = NativeQuadrotor3DWorld(p)
    w2.set_state(x, t)
    w.simulate(np.array([7.7, -0.03, 0.02, -0.001], np.float32))
    w2.simulate(np.array([7.7, -0.03, 0.02, -0.001], np.float32))
    np.testing.assert_allclose(w.get_x(), w2.get_x(), atol=1e-6)


def test_mismatch_harness():
    from mppi_gpu_tpu.miss import run_mismatch_config

    cfg = load_config(CFG)
    res = run_mismatch_config(cfg, n_steps=30)
    assert res.traj_model.shape == (31, 13)
    assert res.traj_world.shape == (31, 13)
    assert 0.0 < res.position_rmse < 5.0
