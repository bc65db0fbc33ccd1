"""Cross-validation of the ground-truth worlds against REAL MuJoCo.

The reference's plant IS MuJoCo 2.00 (reference src/PointMassEnv.cpp:53-61,
129-139: mj_loadXML + mj_step at timestep 0.01, ~2 steps per 1/60 s control
cycle). Round 1 validated our analytic JAX world and the native C++ world
against *each other* — a closed loop of self-agreement. This module closes
the loop against the real thing: load the SAME MJCF into MuJoCo, drive the
mismatch harness's open-loop input sequence through both, and measure the
gap.

Requires the `mujoco` package (optional dependency, skips if absent; modern
MuJoCo parses this MJCF with the same RK4/slide-joint/armature/damping
semantics as the vendored 2.00 binary — the reference's own mjkey.txt
expired in 2021, so the vendored libmujoco200 itself cannot be activated).

Measured (MuJoCo 3.10, 100 control cycles, recorded in
docs/architecture.md):
  * interior regime (|q| < 1.4 − margin): the analytic world tracks real
    MuJoCo to ~2e-7 in position — the plants are numerically identical away
    from the constraint solver (same RK4, same armature/damping/gear; the
    deliberate controller-model-vs-plant mismatch is a separate, much
    larger, intended gap),
  * limit regime: full thrust into the joint limit — MuJoCo's soft
    constraint vs our hard clamp+zero-velocity differ by ~1e-3 in terminal
    position (quantified, not assumed).
"""

from __future__ import annotations

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax.numpy as jnp

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.envs import make_jax_world, params_for_config

XML = "envs_xml/point_mass2d.xml"
CTRL_DT = 1.0 / 60.0


def _mj_rollout(us: np.ndarray) -> np.ndarray:
    """Open-loop rollout through real MuJoCo, one 1/60 s control cycle per
    input row (the reference's PointMassEnv::simulate cadence,
    src/PointMassEnv.cpp:129-139). Returns (N+1, 4) [qpos, qvel] states."""
    m = mujoco.MjModel.from_xml_path(XML)
    d = mujoco.MjData(m)
    out = [np.concatenate([d.qpos.copy(), d.qvel.copy()])]
    for u in us:
        d.ctrl[:] = u
        start = d.time
        while d.time - start < CTRL_DT:
            mujoco.mj_step(m, d)
        out.append(np.concatenate([d.qpos.copy(), d.qvel.copy()]))
    return np.asarray(out)


def _jax_rollout(us: np.ndarray) -> np.ndarray:
    cfg = load_config("configs/point_mass2d.yaml")
    world = make_jax_world(cfg, params_for_config(cfg))
    ws = world.reset()
    out = [np.asarray(ws.x)]
    for u in us:
        ws, _ = world.simulate(ws, jnp.asarray(u, jnp.float32))
        out.append(np.asarray(ws.x))
    return np.asarray(out)


def test_interior_tracking_vs_real_mujoco():
    rng = np.random.default_rng(0)
    # oscillatory drive + noise: excites the dynamics across the ctrlrange
    # like the miss harness's N(0,1) sequence, but the bounded-position
    # response keeps the rollout inside the +-1.4 joint range so the
    # interior (constraint-free) physics is what gets measured
    t = np.arange(100)[:, None]
    us = 0.5 * np.sin(0.35 * t + np.array([[0.0, 1.3]])) + 0.1 * rng.standard_normal((100, 2))
    mj = _mj_rollout(us)
    jx = _jax_rollout(us)
    assert np.all(np.abs(mj[:, :2]) < 1.3), "drove into the limit; reseed"
    gap_q = np.abs(mj[:, :2] - jx[:, :2]).max()
    gap_qd = np.abs(mj[:, 2:] - jx[:, 2:]).max()
    print(f"interior gap: position {gap_q:.2e}, velocity {gap_qd:.2e}")
    assert gap_q < 2e-3
    assert gap_qd < 2e-2


def test_mujoco_world_backend_closed_loop():
    """The real-MuJoCo world as a first-class `--world mujoco` backend: a
    short closed-loop episode must track the JAX-world episode (identical
    physics, f32-level gap) and make progress toward the goal."""
    from mppi_gpu_tpu.controller import MPPIController
    from mppi_gpu_tpu.runner import run_closed_loop

    cfg = load_config("configs/point_mass2d.yaml").replace(samples=256, horizon=20)
    res_mj = run_closed_loop(MPPIController(cfg), world_backend="mujoco", max_steps=25)
    res_jx = run_closed_loop(MPPIController(cfg), world_backend="jax", max_steps=25)
    # both runs consume the identical noise stream; the only gap is f32
    # MuJoCo-vs-JAX physics rounding amplified through 25 cascaded solves —
    # a few 1e-4 after the round-5 sampler change moved which stream a seed
    # maps to (tolerance is stream-dependent luck, not a physics gap)
    np.testing.assert_allclose(res_mj.xs, res_jx.xs, atol=5e-4)
    goal = np.asarray(cfg.goal[:2])
    assert np.linalg.norm(res_mj.xs[-1][:2] - goal) < np.linalg.norm(
        res_mj.xs[0][:2] - goal
    )


def test_mujoco_world_mismatch_harness():
    """`miss --world mujoco`: the open-loop harness against the real plant.
    The plant-vs-plant gap must be negligible next to the intended
    model-vs-plant mismatch the harness exists to measure."""
    from mppi_gpu_tpu.miss import run_mismatch

    r_mj = run_mismatch(2, n_steps=40, world_backend="mujoco")
    r_jx = run_mismatch(2, n_steps=40, world_backend="jax")
    plant_gap = np.abs(r_mj.traj_world - r_jx.traj_world).max()
    assert plant_gap < 1e-4
    assert r_mj.position_rmse > 100 * plant_gap  # the intended mismatch dominates


def test_mujoco_world_checkpoint_restore():
    from mppi_gpu_tpu.envs.mujoco_world import MujocoPointMassWorld
    from mppi_gpu_tpu.envs.params import WorldParams

    w = MujocoPointMassWorld(WorldParams(n_axes=2))
    for _ in range(5):
        w.simulate(np.array([0.5, -0.3]))
    x, t = w.get_x(), w.time
    w2 = MujocoPointMassWorld(WorldParams(n_axes=2))
    w2.set_state(x, t)
    w.simulate(np.array([0.2, 0.2]))
    w2.simulate(np.array([0.2, 0.2]))
    np.testing.assert_allclose(w.get_x(), w2.get_x(), atol=1e-6)


def _analytic_cycles(world, us: np.ndarray) -> np.ndarray:
    """Jitted open-loop rollout of an analytic family world, one control
    cycle per input row. Returns (N, state_dim) states after each cycle."""
    import jax

    @jax.jit
    def roll(us):
        def body(s, u):
            s, _ = world.simulate(s, u)
            return s, s.x

        _, xs = jax.lax.scan(body, world.reset(), us)
        return xs

    return np.asarray(roll(jnp.asarray(us)))


def test_pendulum_world_vs_real_mujoco():
    """The generated pendulum MJCF (tip point-mass, damping b=c·m·l²) is the
    same plant as PendulumWorld's ODE: real mj_step tracks the analytic RK4
    world to f32 rounding (measured ~3e-6 over 80 cycles)."""
    from mppi_gpu_tpu.envs.mujoco_world import MujocoPendulumWorld
    from mppi_gpu_tpu.envs.pendulum_world import PendulumParams, PendulumWorld

    p = PendulumParams()
    rng = np.random.default_rng(0)
    us = (1.5 * np.sin(0.3 * np.arange(80)) + 0.3 * rng.standard_normal(80)).astype(
        np.float32
    )[:, None]
    jx = _analytic_cycles(PendulumWorld(p), us)
    mj = MujocoPendulumWorld(p)
    gaps = []
    for t, u in enumerate(us):
        mj.simulate(u)
        gaps.append(np.abs(jx[t] - mj.get_x()))
    gap = np.asarray(gaps).max(axis=0)
    print(f"pendulum gap vs real MuJoCo [th, thd]: {gap}")
    assert gap[0] < 1e-4 and gap[1] < 1e-3


def test_cartpole_world_vs_real_mujoco():
    """The generated cart-pole MJCF (uniform rod of half-length l → the 4/3
    inertia factor) is the same plant as CartPoleWorld's Barto ODE: real
    mj_step tracks the analytic RK4 world to f32 rounding (measured ~2e-6
    over 60 cycles)."""
    from mppi_gpu_tpu.envs.cartpole_world import CartPoleParams, CartPoleWorld
    from mppi_gpu_tpu.envs.mujoco_world import MujocoCartPoleWorld

    p = CartPoleParams()
    rng = np.random.default_rng(1)
    us = (2.0 * np.sin(0.5 * np.arange(60)) + 0.5 * rng.standard_normal(60)).astype(
        np.float32
    )[:, None]
    jx = _analytic_cycles(CartPoleWorld(p), us)
    mj = MujocoCartPoleWorld(p)
    gaps = []
    for t, u in enumerate(us):
        mj.simulate(u)
        gaps.append(np.abs(jx[t] - mj.get_x()))
    gap = np.asarray(gaps).max(axis=0)
    print(f"cartpole gap vs real MuJoCo [p, th, pd, thd]: {gap}")
    assert np.all(gap < np.array([1e-4, 1e-4, 1e-3, 1e-3]))


def test_quadrotor_world_vs_real_mujoco():
    """The generated planar-quadrotor MJCF (two slide joints + hinge through
    the COM, site-transmission thrusters at ∓arm) is the same plant as
    QuadrotorWorld's ODE: real mj_step tracks the analytic RK4 world to f32
    rounding. Also pins the mixer sign conventions (positive D = extra left
    thrust → right tip down → +x drift) against MuJoCo's own rigid-body
    mechanics."""
    from mppi_gpu_tpu.envs.mujoco_world import MujocoQuadrotorWorld
    from mppi_gpu_tpu.envs.quadrotor_world import QuadrotorParams, QuadrotorWorld

    p = QuadrotorParams()
    hover = p.mass * p.gravity
    rng = np.random.default_rng(2)
    us = np.stack(
        [
            hover + 1.0 * np.sin(0.4 * np.arange(60)) + 0.3 * rng.standard_normal(60),
            0.25 * np.sin(0.7 * np.arange(60)) + 0.05 * rng.standard_normal(60),
        ],
        axis=1,
    ).astype(np.float32)
    jx = _analytic_cycles(QuadrotorWorld(p), us)
    mj = MujocoQuadrotorWorld(p)
    gaps = []
    for t, u in enumerate(us):
        mj.simulate(u)
        gaps.append(np.abs(jx[t] - mj.get_x()))
    gap = np.asarray(gaps).max(axis=0)
    print(f"quadrotor gap vs real MuJoCo [px, pz, th, vx, vz, om]: {gap}")
    assert np.all(gap < np.array([1e-3, 1e-3, 1e-3, 1e-2, 1e-2, 1e-2]))


def test_quadrotor3d_world_vs_real_mujoco():
    """The generated 3-D quadrotor MJCF (freejoint + four site-transmission
    rotors with ±κ yaw-drag gear) is the same plant as Quadrotor3DWorld's
    quaternion ODE: real mj_step tracks the analytic RK4 world to f32
    rounding — including MuJoCo's freejoint conventions (world-frame
    velocity, BODY-frame angular velocity) matching the analytic state
    layout verbatim."""
    from mppi_gpu_tpu.envs.mujoco_world import MujocoQuadrotor3DWorld
    from mppi_gpu_tpu.envs.quadrotor3d_world import Quadrotor3DParams, Quadrotor3DWorld

    p = Quadrotor3DParams()
    hover = p.mass * p.gravity
    rng = np.random.default_rng(5)
    t = np.arange(60)
    us = np.stack(
        [
            hover + 1.0 * np.sin(0.4 * t) + 0.3 * rng.standard_normal(60),
            0.03 * np.sin(0.7 * t) + 0.01 * rng.standard_normal(60),
            0.03 * np.cos(0.6 * t) + 0.01 * rng.standard_normal(60),
            0.006 * np.sin(0.5 * t),
        ],
        axis=1,
    ).astype(np.float32)
    jx = _analytic_cycles(Quadrotor3DWorld(p), us)
    mj = MujocoQuadrotor3DWorld(p)
    gaps = []
    for i, u in enumerate(us):
        mj.simulate(u)
        gaps.append(np.abs(jx[i] - mj.get_x()))
    gap = np.asarray(gaps).max(axis=0)
    print(f"quadrotor3d gap vs real MuJoCo [p, quat, v, om]: {gap}")
    assert np.all(gap[0:3] < 1e-3), gap    # position
    assert np.all(gap[3:7] < 1e-3), gap    # quaternion
    assert np.all(gap[7:13] < 1e-2), gap   # velocities


def test_arm_world_vs_real_mujoco():
    """The generated two-link-arm MJCF (uniform-rod inertials, joint
    damping) is the same plant as ArmWorld's closed-form manipulator ODE:
    real mj_step — MuJoCo's CRB dynamics, an independent derivation —
    tracks the analytic RK4 world to f32 rounding (measured ~3e-6 over 60
    cycles of random torque drive)."""
    from mppi_gpu_tpu.envs.arm_world import ArmParams, ArmWorld
    from mppi_gpu_tpu.envs.mujoco_world import MujocoArmWorld

    p = ArmParams()
    rng = np.random.default_rng(7)
    us = rng.uniform([-6.0, -3.0], [6.0, 3.0], size=(60, 2)).astype(np.float32)
    jx = _analytic_cycles(ArmWorld(p), us)
    mj = MujocoArmWorld(p)
    gaps = []
    for t, u in enumerate(us):
        mj.simulate(u)
        gaps.append(np.abs(jx[t] - mj.get_x()))
    gap = np.asarray(gaps).max(axis=0)
    print(f"arm gap vs real MuJoCo [q1, q2, qd1, qd2]: {gap}")
    assert np.all(gap[:2] < 1e-4), gap
    assert np.all(gap[2:] < 1e-3), gap


def test_arm_mismatch_jax_and_mujoco_agree():
    """`miss` for the arm across its two plants (no native C++ twin): the
    jax fine-RK4 world and real MuJoCo must produce the same open-loop
    trajectory and the same model-vs-plant RMSE."""
    from mppi_gpu_tpu.miss import run_mismatch_config

    cfg = load_config("configs/arm.yaml")
    rj = run_mismatch_config(cfg, n_steps=30, world_backend="jax")
    rm = run_mismatch_config(cfg, n_steps=30, world_backend="mujoco")
    assert np.abs(rj.traj_world - rm.traj_world).max() < 1e-4
    assert abs(rj.position_rmse - rm.position_rmse) < 1e-4


@pytest.mark.parametrize("env", ["pendulum", "cartpole", "quadrotor", "quadrotor3d"])
def test_family_mujoco_closed_loop(env):
    """`--world mujoco` now covers every env family: a short closed-loop
    episode on the real-MuJoCo plant must track the JAX-world episode."""
    from mppi_gpu_tpu.controller import MPPIController
    from mppi_gpu_tpu.runner import run_closed_loop

    # opt_iters pinned to 1: the subject is PLANT physics parity, and each
    # extra MPPI iteration doubles the feedback-loop amplification of the
    # ~1e-6 plant gap (quadrotor3d.yaml ships opt-iters 2 since round 5)
    cfg = load_config(f"configs/{env}.yaml").replace(
        samples=128, horizon=15, opt_iters=1
    )
    res_mj = run_closed_loop(MPPIController(cfg), world_backend="mujoco", max_steps=20)
    res_jx = run_closed_loop(MPPIController(cfg), world_backend="jax", max_steps=20)
    # the ~1e-6 per-cycle plant gap compounds through the feedback loop
    # (nonlinear plants); over 20 cycles this still pins the same physics.
    # The attitude-unstable quadrotors amplify fastest, hence their wider
    # tolerance.
    np.testing.assert_allclose(
        res_mj.xs, res_jx.xs, atol=3e-2 if env.startswith("quadrotor") else 1e-2
    )


@pytest.mark.parametrize("env", ["pendulum", "cartpole", "quadrotor", "quadrotor3d"])
def test_family_mismatch_three_backends_agree(env):
    """`miss` for the dynamic families across all three world backends: the
    same open-loop input through the jax, native-C++, and real-MuJoCo plants
    must produce the same trajectory (plant-vs-plant gap ~1e-6), while the
    model-vs-plant RMSE — the quantity the harness measures — is identical
    across backends."""
    from mppi_gpu_tpu.miss import run_mismatch_config

    cfg = load_config(f"configs/{env}.yaml")
    rj = run_mismatch_config(cfg, n_steps=30, world_backend="jax")
    rn = run_mismatch_config(cfg, n_steps=30, world_backend="native")
    rm = run_mismatch_config(cfg, n_steps=30, world_backend="mujoco")
    assert np.abs(rn.traj_world - rm.traj_world).max() < 1e-4
    assert np.abs(rj.traj_world - rm.traj_world).max() < 1e-4
    assert abs(rj.position_rmse - rm.position_rmse) < 1e-4


def test_family_mujoco_checkpoint_restore():
    from mppi_gpu_tpu.envs.cartpole_world import CartPoleParams
    from mppi_gpu_tpu.envs.mujoco_world import MujocoCartPoleWorld

    w = MujocoCartPoleWorld(CartPoleParams())
    for _ in range(5):
        w.simulate(np.array([1.5]))
    x, t = w.get_x(), w.time
    w2 = MujocoCartPoleWorld(CartPoleParams())
    w2.set_state(x, t)
    w.simulate(np.array([-0.7]))
    w2.simulate(np.array([-0.7]))
    np.testing.assert_allclose(w.get_x(), w2.get_x(), atol=1e-6)


def test_limit_regime_bounded_gap():
    us = np.full((120, 2), 1.0)  # full thrust into the corner
    mj = _mj_rollout(us)
    jx = _jax_rollout(us)
    # both saturate near the 1.4 range; MuJoCo's soft constraint may admit
    # small overshoot where the analytic world clamps hard
    assert np.all(jx[-1, :2] <= 1.4 + 1e-6)
    gap = np.abs(mj[-1, :2] - jx[-1, :2]).max()
    print(f"limit-regime terminal gap: {gap:.3f}")
    assert gap < 0.15
