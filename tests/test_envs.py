"""Ground-truth world tests: JAX env physics, native C++ env parity, episode
cadence (the reference's 1/60 s control cycle + 10 s episode)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.envs.params import WorldParams
from mppi_gpu_tpu.envs.point_mass_world import PointMassWorld
from mppi_gpu_tpu.envs.native import NativePointMassWorld, native_available


def test_world_params_cadence():
    p = WorldParams(n_axes=2)
    assert p.steps_per_control == 2          # ceil((1/60)/0.01)
    # each cycle advances ceil((1/60)/0.01)=2 physics steps = 0.02 s of sim
    # time, so a 10 s episode is ~500 control cycles (the reference's loop
    # advances the same way: 2 mj_steps of 0.01 s per simulate() call)
    assert 495 <= p.num_control_steps() <= 505
    assert p.effective_mass == pytest.approx(0.5235988 + 0.01, rel=1e-4)


def test_jax_world_analytic_solution():
    """Constant force, no damping-free solution check: with damping c and
    gear g, v(t) = (g·u/c)(1 − e^{−ct/m}); RK4 at dt=0.01 should track the
    exact solution to ~1e-6."""
    p = WorldParams(n_axes=1)
    world = PointMassWorld(p)
    u_val = 0.05  # small: keeps q inside the ±1.4 joint limit over the test
    u = jnp.asarray([u_val], jnp.float32)
    s = world.reset()
    for _ in range(100):
        s = world.physics_step(s, u)
    t = 100 * p.timestep
    m, c, g = p.effective_mass, p.damping, p.gear
    v_exact = (g * u_val / c) * (1 - math.exp(-c * t / m))
    q_exact = (g * u_val / c) * (t - (m / c) * (1 - math.exp(-c * t / m)))
    assert abs(float(s.q[0])) < p.joint_range  # limit must not be active
    np.testing.assert_allclose(float(s.qd[0]), v_exact, rtol=1e-5)
    np.testing.assert_allclose(float(s.q[0]), q_exact, rtol=1e-4)


def test_jax_world_ctrl_clamped():
    p = WorldParams(n_axes=1)
    world = PointMassWorld(p)
    s1 = world.reset()
    s2 = world.reset()
    for _ in range(10):
        s1 = world.physics_step(s1, jnp.asarray([5.0]))   # above ctrl_range
        s2 = world.physics_step(s2, jnp.asarray([1.0]))   # at the limit
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), rtol=1e-6)


def test_jax_world_simulate_done_at_10s():
    p = WorldParams(n_axes=1)
    world = PointMassWorld(p)
    s = world.reset()
    u = jnp.zeros(1)
    n = 0
    done = False
    while not done and n < 700:
        s, done = world.simulate(s, u)
        done = bool(done)
        n += 1
    assert done
    assert abs(float(s.time) - 10.0) < 0.05
    assert 495 <= n <= 510  # ~500 cycles of 0.02 s each


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_world_matches_jax_world(rng):
    """The C++ world and the JAX world implement identical physics — this is
    the cross-implementation oracle test (same spirit as the reference's GPU
    vs CPU kernel tests)."""
    for n_axes in (1, 2, 3):
        p = WorldParams(n_axes=n_axes)
        jw = PointMassWorld(p)
        nw = NativePointMassWorld(p)
        s = jw.reset()
        us = rng.uniform(-1, 1, size=(50, n_axes)).astype(np.float32)
        sim = jax.jit(jw.simulate)
        for u in us:
            s, _ = sim(s, jnp.asarray(u))
            nw.simulate(u)
        np.testing.assert_allclose(np.asarray(s.x), nw.get_x(), rtol=2e-4, atol=2e-5)
        assert abs(float(s.time) - nw.time) < 1e-4


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_world_rollout_matches_stepwise(rng):
    p = WorldParams(n_axes=2)
    us = rng.uniform(-1, 1, size=(20, 2)).astype(np.float32)
    w1 = NativePointMassWorld(p)
    traj = w1.rollout(us)
    w2 = NativePointMassWorld(p)
    xs = [w2.get_x()]
    for u in us:
        w2.simulate(u)
        xs.append(w2.get_x())
    np.testing.assert_allclose(traj, np.asarray(xs), rtol=1e-6)
    assert traj.shape == (21, 4)


def test_mismatch_harness_all_families():
    """The miss harness covers every model family; for the ODE-sharing
    families (pendulum/cartpole/quadrotor) the open-loop gap is pure
    integrator + actuator-envelope mismatch and must be small but
    nonzero. (The quadrotor is attitude-UNSTABLE open loop: any integrator
    + envelope-clamp gap compounds exponentially through the tilt, so its
    40-step bound is orders looser — the harness still proves all three
    backends measure the same gap, tests/test_mujoco_xval.py.)"""
    from mppi_gpu_tpu.config import load_config
    from mppi_gpu_tpu.miss import run_mismatch_config

    for cfg_path, tol in (
        ("configs/pendulum.yaml", 0.05),
        ("configs/cartpole.yaml", 0.25),
        ("configs/quadrotor.yaml", 30.0),
    ):
        cfg = load_config(cfg_path)
        res = run_mismatch_config(cfg, n_steps=40)
        assert res.traj_model.shape == res.traj_world.shape == (41, cfg.state_dim)
        err = float(np.abs(res.traj_model - res.traj_world).max())
        assert 0.0 < err < tol, f"{cfg_path}: integrator gap {err}"
